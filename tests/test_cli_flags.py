"""CLI flag-combination hygiene: every advertised flag either works or
refuses loudly in each engine/mesh mode (VERDICT r2 #7 — --balance-every
used to be a silent no-op off the general path).

Runs the CLI in-process via cli.main(argv) (cheap; the subprocess
end-to-end path is covered by test_engine_auto / test_tools)."""

import io
import os
import re
from contextlib import redirect_stdout

import conftest  # noqa: F401
from conftest import reference_deck

import numpy as np
import pytest

from radiative_transfer_tpu import cli

BAL_RE = re.compile(r"step\s+\d+: balance max=", re.M)


def _deck(tmp_path, steps=4, N=64):
    text = open(reference_deck("single_group.prm")).read()
    text = text.replace("max_timesteps=1000", f"max_timesteps={steps}")
    text = text.replace("N=100", f"N={N}")
    path = os.path.join(tmp_path, "deck.prm")
    open(path, "w").write(text)
    return path


MODES = [
    (["--engine", "general"], 4),
    (["--engine", "fast"], 4),
    (["--engine", "pallas", "--dtype", "float32"], 4),
    (["--engine", "auto", "--dtype", "float32"], 4),
    (["--engine", "general", "--mesh", "1x2"], 4),
    (["--engine", "fast", "--mesh", "1x2"], 4),
    (["--engine", "pallas", "--mesh", "1x2", "--dtype", "float32"], 4),
    (["--engine", "auto", "--mesh", "1x4", "--dtype", "float32"], 4),
]


@pytest.mark.parametrize("extra,steps", MODES,
                         ids=[" ".join(m[0]) for m in MODES])
def test_balance_every_prints_in_every_mode(tmp_path, extra, steps):
    """--balance-every must stream the balance diagnostic (not silently
    no-op) for every engine and mesh mode."""
    deck = _deck(str(tmp_path), steps=steps)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main([deck, "--outdir", str(tmp_path), "--balance-every",
                       "2", *extra])
    out = buf.getvalue()
    assert rc == 0, out[-2000:]
    lines = BAL_RE.findall(out)
    assert len(lines) == steps // 2, out[-2000:]
    assert "wrote 8 CSVs" in out


def test_balance_every_with_checkpoint_refuses(tmp_path):
    deck = _deck(str(tmp_path))
    with pytest.raises(SystemExit) as ei:
        cli.main([deck, "--outdir", str(tmp_path), "--balance-every", "2",
                  "--checkpoint-dir", str(tmp_path / "ck")])
    assert ei.value.code == 2


def test_balance_every_matches_plain_run(tmp_path):
    """Chunking with the balance stream must not change the solution."""
    deck = _deck(str(tmp_path), steps=4)
    a, b = tmp_path / "a", tmp_path / "b"
    with redirect_stdout(io.StringIO()):
        assert cli.main([deck, "--outdir", str(a), "--engine", "pallas",
                         "--dtype", "float32"]) == 0
        assert cli.main([deck, "--outdir", str(b), "--engine", "pallas",
                         "--dtype", "float32", "--balance-every", "1"]) == 0
    for f in ("phi.csv", "F.csv", "psi.csv"):
        np.testing.assert_array_equal(np.loadtxt(a / f), np.loadtxt(b / f))
