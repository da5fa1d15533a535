// Link stubs for building the reference PHY sources standalone (no audio, no GUI).
// The reference tree at /root/reference is compiled IN PLACE (never copied);
// this file only provides the globals/symbols main.cc + audioio would define.
#include <complex>
#include <cstdint>
#include <cstddef>
#include <pthread.h>
#include "gui/gui_state.h"
#include "common/ring_buffer_posix.h"

int g_verbose = 0;
double carrier_frequency_offset = 0;
double test_tx_carrier_offset = 0;
int radio_type = 1; // RADIO_STOCKHF
char *input_dev = nullptr;
char *output_dev = nullptr;

cbuf_handle_t capture_buffer = nullptr;
cbuf_handle_t playback_buffer = nullptr;
pthread_mutex_t capture_prep_mutex = PTHREAD_MUTEX_INITIALIZER;

st_gui_state &get_gui_state() {
  static st_gui_state s;
  return s;
}

int tx_transfer(double *buffer, size_t len) { (void)buffer; (void)len; return 0; }
int rx_transfer(double *buffer, size_t len) { (void)buffer; (void)len; return 0; }
