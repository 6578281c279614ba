#include "Constants.h"
