// Native data-loader hot path: wav parsing, PCM conversion, resampling.
//
// The host-side data layer (codec segment loading, offline tokenization,
// serving PCM framing) is bandwidth-sensitive at production scale; this
// keeps it off the Python interpreter. Compiled on first use via g++ into a
// shared library and bound through ctypes (no pybind11 dependency); the
// numpy implementations in rstnet_tpu/utils/audio.py remain as fallback.
//
// All functions are plain C ABI.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Parse a RIFF/WAVE file. Writes interleaved float32 samples in [-1, 1].
// Returns the number of frames written, or a negative error code.
//   -1 open failed, -2 not a wav, -3 unsupported encoding, -4 buffer small
long wav_read(const char* path, float* out, long max_samples, int* sample_rate,
              int* channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || fread(&riff_size, 4, 1, f) != 1 ||
      fread(wave, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) != 0 ||
      memcmp(wave, "WAVE", 4) != 0) {
    fclose(f);
    return -2;
  }
  uint16_t audio_format = 0, num_channels = 0, bits = 0;
  uint32_t sr = 0;
  long produced = -3;
  // chunk walk
  for (;;) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) break;
    if (memcmp(id, "fmt ", 4) == 0) {
      uint8_t buf[40];
      uint32_t n = size < sizeof(buf) ? size : (uint32_t)sizeof(buf);
      if (fread(buf, 1, n, f) != n) break;
      if (size > n) fseek(f, size - n, SEEK_CUR);
      audio_format = (uint16_t)(buf[0] | buf[1] << 8);
      num_channels = (uint16_t)(buf[2] | buf[3] << 8);
      sr = (uint32_t)(buf[4] | buf[5] << 8 | buf[6] << 16 | (uint32_t)buf[7] << 24);
      bits = (uint16_t)(buf[14] | buf[15] << 8);
    } else if (memcmp(id, "data", 4) == 0) {
      if (num_channels == 0 || bits == 0) break;
      long n_samples = size / (bits / 8);
      if (n_samples > max_samples) n_samples = max_samples;
      if (audio_format == 1 && bits == 16) {
        std::vector<int16_t> tmp(n_samples);
        long got = (long)fread(tmp.data(), 2, n_samples, f);
        for (long i = 0; i < got; ++i) out[i] = tmp[i] / 32768.0f;
        produced = got;
      } else if (audio_format == 1 && bits == 32) {
        std::vector<int32_t> tmp(n_samples);
        long got = (long)fread(tmp.data(), 4, n_samples, f);
        for (long i = 0; i < got; ++i) out[i] = tmp[i] / 2147483648.0f;
        produced = got;
      } else if (audio_format == 3 && bits == 32) {  // IEEE float
        produced = (long)fread(out, 4, n_samples, f);
      } else if (audio_format == 1 && bits == 8) {
        std::vector<uint8_t> tmp(n_samples);
        long got = (long)fread(tmp.data(), 1, n_samples, f);
        for (long i = 0; i < got; ++i) out[i] = (tmp[i] - 128) / 128.0f;
        produced = got;
      }
      break;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  fclose(f);
  if (produced >= 0) {
    *sample_rate = (int)sr;
    *channels = (int)num_channels;
  }
  return produced;
}

// Linear-interpolation resampler over a mono float stream.
void resample_linear(const float* in, long n_in, float* out, long n_out) {
  if (n_in <= 1 || n_out <= 0) return;
  double step = (double)n_in / (double)n_out;
  for (long i = 0; i < n_out; ++i) {
    double pos = i * step;
    long i0 = (long)pos;
    if (i0 >= n_in - 1) {
      out[i] = in[n_in - 1];
      continue;
    }
    double frac = pos - i0;
    out[i] = (float)(in[i0] * (1.0 - frac) + in[i0 + 1] * frac);
  }
}

// float32 [-1,1] -> int16 PCM bytes (serving hot path).
void float_to_pcm16(const float* in, long n, int16_t* out) {
  for (long i = 0; i < n; ++i) {
    float v = in[i] * 32767.0f;
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32768.0f) v = -32768.0f;
    out[i] = (int16_t)v;
  }
}

void pcm16_to_float(const int16_t* in, long n, float* out) {
  for (long i = 0; i < n; ++i) out[i] = in[i] / 32768.0f;
}

}  // extern "C"
