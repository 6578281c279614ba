#define TRANSFER_DIR "/root/reference/"
