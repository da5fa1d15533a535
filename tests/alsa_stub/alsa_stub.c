/* Contract-test stub for libasound (VERDICT r3 item 8: the ALSA ctypes
 * backend was only ever tested for clean failure). Implements exactly the
 * API surface mercury_tpu.native.audio.AlsaDevice uses, with:
 *  - a transcript (ALSA_STUB_LOG env) recording every call + parameters,
 *  - an in-process loopback ring: frames written by the playback PCM are
 *    returned by the capture PCM (interleaved float, as ALSA would),
 *  - a one-shot injectable xrun: the first writei after
 *    alsa_stub_arm_xrun() returns -EPIPE so the recover path runs.
 * Built by tests/test_audio.py at session start (gcc, no deps); loaded by
 * monkeypatching ctypes.util.find_library("asound").
 */
#include <stdarg.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define STUB_RING 1 << 20

static float g_ring[STUB_RING];
static long g_w = 0, g_r = 0;
static int g_channels = 0;
static int g_arm_xrun = 0;
static int g_recover_calls = 0;

static void logf_(const char *fmt, ...) {
  const char *path = getenv("ALSA_STUB_LOG");
  if (!path) return;
  FILE *f = fopen(path, "a");
  if (!f) return;
  va_list ap;
  va_start(ap, fmt);
  vfprintf(f, fmt, ap);
  va_end(ap);
  fputc('\n', f);
  fclose(f);
}

typedef struct { int stream; } stub_pcm;

int snd_pcm_open(void **pcmp, const char *name, int stream, int mode) {
  stub_pcm *p = (stub_pcm *)malloc(sizeof(stub_pcm));
  p->stream = stream;
  *pcmp = p;
  logf_("open name=%s stream=%d mode=%d", name, stream, mode);
  return 0;
}

int snd_pcm_set_params(void *pcm, int format, int access, unsigned channels,
                       unsigned rate, int soft_resample, unsigned latency) {
  g_channels = (int)channels;
  logf_("set_params format=%d access=%d channels=%u rate=%u resample=%d "
        "latency=%u", format, access, channels, rate, soft_resample, latency);
  return 0;
}

long snd_pcm_writei(void *pcm, const void *buf, unsigned long frames) {
  if (g_arm_xrun) {
    g_arm_xrun = 0;
    logf_("writei XRUN frames=%lu", frames);
    return -32; /* -EPIPE */
  }
  const float *f = (const float *)buf;
  unsigned long n = frames * (unsigned long)g_channels;
  for (unsigned long i = 0; i < n; i++)
    g_ring[(g_w + i) % (STUB_RING)] = f[i];
  g_w += n;
  logf_("writei frames=%lu", frames);
  return (long)frames;
}

long snd_pcm_readi(void *pcm, void *buf, unsigned long frames) {
  float *f = (float *)buf;
  unsigned long avail = (unsigned long)((g_w - g_r) / g_channels);
  unsigned long take = frames < avail ? frames : avail;
  unsigned long n = take * (unsigned long)g_channels;
  for (unsigned long i = 0; i < n; i++)
    f[i] = g_ring[(g_r + i) % (STUB_RING)];
  g_r += n;
  logf_("readi frames=%lu returned=%lu", frames, take);
  return (long)take;
}

int snd_pcm_recover(void *pcm, int err, int silent) {
  g_recover_calls++;
  logf_("recover err=%d silent=%d", err, silent);
  return 0;
}

int snd_pcm_close(void *pcm) {
  logf_("close");
  free(pcm);
  return 0;
}

const char *snd_strerror(int err) { return "stub error"; }

/* device hints: one fake device */
static void *g_hints[2];
static char g_hint_name[] = "stubpcm0";

int snd_device_name_hint(int card, const char *iface, void ***hints) {
  g_hints[0] = (void *)g_hint_name;
  g_hints[1] = NULL;
  *hints = g_hints;
  logf_("hint iface=%s", iface);
  return 0;
}

void *snd_device_name_get_hint(const void *hint, const char *id) {
  return strdup((const char *)hint);
}

int snd_device_name_free_hint(void **hints) { return 0; }

/* test controls */
void alsa_stub_arm_xrun(void) { g_arm_xrun = 1; }
int alsa_stub_recover_calls(void) { return g_recover_calls; }
void alsa_stub_reset(void) {
  g_w = g_r = 0;
  g_arm_xrun = 0;
  g_recover_calls = 0;
}
