// Native audio decode + resample for the training data loader.
//
// The reference delegates audio decode/resample to pydub/ffmpeg
// (reference: osuT5/osuT5/dataset/data_utils.py:76); this image has no
// ffmpeg, and the Python WAV path costs real time when a data loader feeds
// per-track audio for thousands of mapsets. This library does:
//   - RIFF/WAVE parsing (PCM u8/s16/s24/s32 and float32), mono mixdown
//   - windowed-sinc polyphase resampling to the model sample rate
// exposed through a small C ABI consumed via ctypes (no pybind11 in image).
//
// Build: see beatheritage_tpu/native/build.py (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

struct WavData {
    std::vector<float> samples;  // mono
    int sample_rate = 0;
};

uint32_t rd_u32(const uint8_t* p) {
    return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
           (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) {
    return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

bool parse_wav(const uint8_t* data, size_t len, WavData* out) {
    if (len < 12 || std::memcmp(data, "RIFF", 4) != 0 ||
        std::memcmp(data + 8, "WAVE", 4) != 0) {
        return false;
    }
    size_t pos = 12;
    uint16_t format = 0, channels = 0, bits = 0;
    uint32_t sample_rate = 0;
    const uint8_t* pcm = nullptr;
    size_t pcm_len = 0;

    while (pos + 8 <= len) {
        const uint8_t* chunk = data + pos;
        uint32_t chunk_len = rd_u32(chunk + 4);
        const uint8_t* body = chunk + 8;
        if (pos + 8 + chunk_len > len) chunk_len = static_cast<uint32_t>(len - pos - 8);
        if (std::memcmp(chunk, "fmt ", 4) == 0 && chunk_len >= 16) {
            format = rd_u16(body);
            channels = rd_u16(body + 2);
            sample_rate = rd_u32(body + 4);
            bits = rd_u16(body + 14);
        } else if (std::memcmp(chunk, "data", 4) == 0) {
            pcm = body;
            pcm_len = chunk_len;
        }
        pos += 8 + chunk_len + (chunk_len & 1);  // chunks are 2-byte aligned
    }
    if (!pcm || channels == 0 || sample_rate == 0) return false;
    // WAVE_FORMAT_EXTENSIBLE (0xFFFE) carries the real format in the
    // extension; PCM layouts below still apply for the common cases.
    if (format != 1 && format != 3 && format != 0xFFFE) return false;

    size_t bytes_per = bits / 8;
    if (bytes_per == 0) return false;
    size_t frames = pcm_len / (bytes_per * channels);
    out->sample_rate = static_cast<int>(sample_rate);
    out->samples.resize(frames);

    const double inv_channels = 1.0 / channels;
    for (size_t i = 0; i < frames; ++i) {
        double acc = 0.0;
        for (unsigned c = 0; c < channels; ++c) {
            const uint8_t* s = pcm + (i * channels + c) * bytes_per;
            double v = 0.0;
            if (format == 3 && bits == 32) {
                float f;
                std::memcpy(&f, s, 4);
                v = f;
            } else if (bits == 16) {
                int16_t x;
                std::memcpy(&x, s, 2);
                v = x / 32768.0;
            } else if (bits == 8) {
                v = (static_cast<int>(s[0]) - 128) / 128.0;
            } else if (bits == 24) {
                int32_t x = static_cast<int32_t>(s[0]) |
                            (static_cast<int32_t>(s[1]) << 8) |
                            (static_cast<int32_t>(s[2]) << 16);
                if (x & 0x800000) x -= 0x1000000;
                v = x / 8388608.0;
            } else if (bits == 32) {
                int32_t x;
                std::memcpy(&x, s, 4);
                v = x / 2147483648.0;
            }
            acc += v;
        }
        out->samples[i] = static_cast<float>(acc * inv_channels);
    }
    return true;
}

// Windowed-sinc polyphase resampler: fixed 32 taps per output sample, Hann
// window, cutoff at the lower of the two Nyquists.
std::vector<float> resample(const std::vector<float>& in, double sr_in,
                            double sr_out) {
    if (sr_in == sr_out || in.empty()) return in;
    const double ratio = sr_out / sr_in;
    const size_t out_len = static_cast<size_t>(in.size() * ratio);
    const int half_taps = 16;
    const double cutoff = (ratio < 1.0 ? ratio : 1.0) * 0.95;  // anti-alias
    std::vector<float> out(out_len);

    for (size_t n = 0; n < out_len; ++n) {
        const double t = n / ratio;  // position in input samples
        const long center = static_cast<long>(t);
        double acc = 0.0, norm = 0.0;
        for (long k = center - half_taps + 1; k <= center + half_taps; ++k) {
            if (k < 0 || k >= static_cast<long>(in.size())) continue;
            const double x = (t - k) * cutoff;
            const double sinc = x == 0.0 ? 1.0 : std::sin(kPi * x) / (kPi * x);
            const double w = 0.5 + 0.5 * std::cos(kPi * (t - k) / half_taps);
            const double h = sinc * w;
            acc += in[k] * h;
            norm += h;
        }
        out[n] = static_cast<float>(norm != 0.0 ? acc / norm * cutoff / cutoff : 0.0);
        if (norm != 0.0) out[n] = static_cast<float>(acc / norm);
    }
    return out;
}

}  // namespace

extern "C" {

// Decode a WAV byte buffer to mono float32 at target_sr.
// Returns 0 on success; caller frees *out with bh_free.
int bh_decode_wav(const uint8_t* data, size_t len, int target_sr,
                  double speed, int normalize, float** out, size_t* out_len) {
    WavData wav;
    if (!parse_wav(data, len, &wav)) return 1;
    // speed multiplier: reinterpret the source rate (DT augmentation trick,
    // reference data_utils.py:92)
    double effective_sr = wav.sample_rate * speed;
    std::vector<float> resampled =
        resample(wav.samples, effective_sr, static_cast<double>(target_sr));
    if (normalize && !resampled.empty()) {
        float peak = 0.0f;
        for (float v : resampled) peak = std::max(peak, std::fabs(v));
        if (peak > 0.0f) {
            const float inv = 1.0f / peak;
            for (float& v : resampled) v *= inv;
        }
    }
    *out_len = resampled.size();
    *out = static_cast<float*>(std::malloc(resampled.size() * sizeof(float)));
    if (*out == nullptr) return 2;
    std::memcpy(*out, resampled.data(), resampled.size() * sizeof(float));
    return 0;
}

void bh_free(float* ptr) { std::free(ptr); }

// Frame a signal into (n_frames, frame_len) hop-strided rows (the data
// loader's windowing inner loop).
int bh_frame_signal(const float* samples, size_t n, int frame_len, int hop,
                    float* out, size_t out_rows) {
    for (size_t r = 0; r < out_rows; ++r) {
        const size_t start = r * hop;
        for (int i = 0; i < frame_len; ++i) {
            const size_t idx = start + i;
            out[r * frame_len + i] = idx < n ? samples[idx] : 0.0f;
        }
    }
    return 0;
}

}  // extern "C"
