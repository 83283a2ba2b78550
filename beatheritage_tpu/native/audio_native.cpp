// Native audio decode + resample for the training data loader.
//
// The reference delegates audio decode/resample to pydub/ffmpeg
// (reference: osuT5/osuT5/dataset/data_utils.py:76); this image has no
// ffmpeg, and the Python WAV path costs real time when a data loader feeds
// per-track audio for thousands of mapsets. This library does:
//   - RIFF/WAVE parsing (PCM u8/s16/s24/s32 and float32), mono mixdown
//   - MP3 decode through the system libmpg123 (dlopen'd, no dev headers)
//   - OGG/Vorbis decode through the system libvorbisfile (dlopen'd)
//   - windowed-sinc polyphase resampling to the model sample rate
//   - MP3/OGG *encoders* (lame/vorbisenc) used only to build test fixtures
// exposed through a small C ABI consumed via ctypes (no pybind11 in image).
//
// Build: see beatheritage_tpu/native/build.py (g++ -O3 -shared -fPIC).

#include <dlfcn.h>

#include <algorithm>
#include <cstdio>
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

// ---- MP3 via system libmpg123 (public stable ABI, resolved at runtime) ----

namespace mpg123_abi {
// enum mpg123_parms / mpg123_param_flags / return codes from the public API
constexpr int kAddFlags = 2;
constexpr long kForceFloat = 0x400;
constexpr int kOk = 0;
constexpr int kDone = -12;
constexpr int kNewFormat = -11;
constexpr int kNeedMore = -10;
constexpr int kEncFloat32 = 0x200;

struct Api {
    int (*init)();
    void* (*make)(const char*, int*);
    void (*destroy)(void*);
    int (*param)(void*, int, long, double);
    int (*open_feed)(void*);
    int (*feed)(void*, const unsigned char*, size_t);
    int (*read)(void*, unsigned char*, size_t, size_t*);
    int (*getformat)(void*, long*, int*, int*);
    bool ok = false;
};

const Api& api() {
    static Api a = [] {
        Api r;
        void* lib = dlopen("libmpg123.so.0", RTLD_NOW | RTLD_LOCAL);
        if (!lib) return r;
        r.init = reinterpret_cast<decltype(r.init)>(dlsym(lib, "mpg123_init"));
        r.make = reinterpret_cast<decltype(r.make)>(dlsym(lib, "mpg123_new"));
        r.destroy = reinterpret_cast<decltype(r.destroy)>(dlsym(lib, "mpg123_delete"));
        r.param = reinterpret_cast<decltype(r.param)>(dlsym(lib, "mpg123_param"));
        r.open_feed = reinterpret_cast<decltype(r.open_feed)>(dlsym(lib, "mpg123_open_feed"));
        r.feed = reinterpret_cast<decltype(r.feed)>(dlsym(lib, "mpg123_feed"));
        r.read = reinterpret_cast<decltype(r.read)>(dlsym(lib, "mpg123_read"));
        r.getformat = reinterpret_cast<decltype(r.getformat)>(dlsym(lib, "mpg123_getformat"));
        r.ok = r.init && r.make && r.destroy && r.param && r.open_feed &&
               r.feed && r.read && r.getformat;
        if (r.ok) r.init();
        return r;
    }();
    return a;
}
}  // namespace mpg123_abi

bool decode_mp3(const uint8_t* data, size_t len, WavData* out) {
    const auto& m = mpg123_abi::api();
    if (!m.ok) return false;
    int err = 0;
    void* h = m.make(nullptr, &err);
    if (!h) return false;
    m.param(h, mpg123_abi::kAddFlags, mpg123_abi::kForceFloat, 0.0);
    if (m.open_feed(h) != mpg123_abi::kOk) { m.destroy(h); return false; }
    if (m.feed(h, data, len) != mpg123_abi::kOk) { m.destroy(h); return false; }

    long rate = 0;
    int channels = 0, encoding = 0;
    std::vector<float> interleaved;
    std::vector<unsigned char> buf(1 << 16);
    for (;;) {
        size_t done = 0;
        int rc = m.read(h, buf.data(), buf.size(), &done);
        if (rc == mpg123_abi::kNewFormat) {
            m.getformat(h, &rate, &channels, &encoding);
            if (encoding != mpg123_abi::kEncFloat32 || channels <= 0) break;
            continue;
        }
        if (done > 0) {
            const float* f = reinterpret_cast<const float*>(buf.data());
            interleaved.insert(interleaved.end(), f, f + done / sizeof(float));
        }
        // kNeedMore after the single feed of the whole file means end of data
        if (rc != mpg123_abi::kOk) break;
    }
    m.destroy(h);
    if (rate <= 0 || channels <= 0 || interleaved.empty()) return false;
    const size_t frames = interleaved.size() / channels;
    out->sample_rate = static_cast<int>(rate);
    out->samples.resize(frames);
    const float inv = 1.0f / channels;
    for (size_t i = 0; i < frames; ++i) {
        float acc = 0.0f;
        for (int c = 0; c < channels; ++c) acc += interleaved[i * channels + c];
        out->samples[i] = acc * inv;
    }
    return true;
}

// ---- OGG/Vorbis via system libvorbisfile ----------------------------------

namespace vorbis_abi {
struct Callbacks {  // matches ov_callbacks: four function pointers
    size_t (*read)(void*, size_t, size_t, void*);
    int (*seek)(void*, int64_t, int);
    int (*close)(void*);
    long (*tell)(void*);
};
struct Info {  // leading fields of vorbis_info (LP64 layout)
    int version;
    int channels;
    long rate;
    long bitrate_upper, bitrate_nominal, bitrate_lower, bitrate_window;
    void* codec_setup;
};

struct Api {
    int (*open_callbacks)(void*, void*, const char*, long, Callbacks);
    Info* (*info)(void*, int);
    long (*read_float)(void*, float***, int, int*);
    int (*clear)(void*);
    bool ok = false;
};

const Api& api() {
    static Api a = [] {
        Api r;
        void* lib = dlopen("libvorbisfile.so.3", RTLD_NOW | RTLD_GLOBAL);
        if (!lib) return r;
        r.open_callbacks = reinterpret_cast<decltype(r.open_callbacks)>(
            dlsym(lib, "ov_open_callbacks"));
        r.info = reinterpret_cast<decltype(r.info)>(dlsym(lib, "ov_info"));
        r.read_float = reinterpret_cast<decltype(r.read_float)>(
            dlsym(lib, "ov_read_float"));
        r.clear = reinterpret_cast<decltype(r.clear)>(dlsym(lib, "ov_clear"));
        r.ok = r.open_callbacks && r.info && r.read_float && r.clear;
        return r;
    }();
    return a;
}

struct MemSrc {
    const uint8_t* data;
    size_t len;
    size_t pos;
};

size_t mem_read(void* ptr, size_t size, size_t nmemb, void* src_v) {
    MemSrc* src = static_cast<MemSrc*>(src_v);
    size_t want = size * nmemb;
    size_t have = src->len - src->pos;
    size_t take = want < have ? want : have;
    std::memcpy(ptr, src->data + src->pos, take);
    src->pos += take;
    return size ? take / size : 0;
}
int mem_seek(void* src_v, int64_t off, int whence) {
    MemSrc* src = static_cast<MemSrc*>(src_v);
    int64_t base = whence == SEEK_SET ? 0
                 : whence == SEEK_CUR ? static_cast<int64_t>(src->pos)
                                      : static_cast<int64_t>(src->len);
    int64_t target = base + off;
    if (target < 0 || target > static_cast<int64_t>(src->len)) return -1;
    src->pos = static_cast<size_t>(target);
    return 0;
}
int mem_close(void*) { return 0; }
long mem_tell(void* src_v) {
    return static_cast<long>(static_cast<MemSrc*>(src_v)->pos);
}
}  // namespace vorbis_abi

bool decode_ogg(const uint8_t* data, size_t len, WavData* out) {
    const auto& v = vorbis_abi::api();
    if (!v.ok) return false;
    vorbis_abi::MemSrc src{data, len, 0};
    // OggVorbis_File is opaque here; over-allocate well past sizeof
    std::vector<uint8_t> vf(4096, 0);
    vorbis_abi::Callbacks cbs{vorbis_abi::mem_read, vorbis_abi::mem_seek,
                              vorbis_abi::mem_close, vorbis_abi::mem_tell};
    if (v.open_callbacks(&src, vf.data(), nullptr, 0, cbs) != 0) return false;
    vorbis_abi::Info* info = v.info(vf.data(), -1);
    if (!info || info->channels <= 0 || info->rate <= 0) {
        v.clear(vf.data());
        return false;
    }
    const int channels = info->channels;
    out->sample_rate = static_cast<int>(info->rate);
    out->samples.clear();
    int bitstream = 0;
    const float inv = 1.0f / channels;
    for (;;) {
        float** pcm = nullptr;
        long got = v.read_float(vf.data(), &pcm, 4096, &bitstream);
        if (got <= 0) break;  // 0 = EOF, <0 = hole/corrupt: stop
        size_t base = out->samples.size();
        out->samples.resize(base + got);
        for (long i = 0; i < got; ++i) {
            float acc = 0.0f;
            for (int c = 0; c < channels; ++c) acc += pcm[c][i];
            out->samples[base + i] = acc * inv;
        }
    }
    v.clear(vf.data());
    return !out->samples.empty();
}

bool sniff_and_decode(const uint8_t* data, size_t len, WavData* out) {
    if (len >= 12 && std::memcmp(data, "RIFF", 4) == 0 &&
        std::memcmp(data + 8, "WAVE", 4) == 0) {
        return parse_wav(data, len, out);
    }
    if (len >= 4 && std::memcmp(data, "OggS", 4) == 0) {
        return decode_ogg(data, len, out);
    }
    // MP3: ID3 tag or raw MPEG sync
    if (len >= 3 && (std::memcmp(data, "ID3", 3) == 0 ||
                     (data[0] == 0xFF && (data[1] & 0xE0) == 0xE0))) {
        return decode_mp3(data, len, out);
    }
    return false;
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

// Decode any supported container (WAV/MP3/OGG, sniffed from magic bytes) to
// mono float32 at target_sr. Same contract as bh_decode_wav.
int bh_decode_audio(const uint8_t* data, size_t len, int target_sr,
                    double speed, int normalize, float** out,
                    size_t* out_len) {
    WavData wav;
    if (!sniff_and_decode(data, len, &wav)) return 1;
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

// Which compressed decoders resolved at runtime (bit 0 = mp3, bit 1 = ogg).
int bh_codec_support() {
    int mask = 0;
    if (mpg123_abi::api().ok) mask |= 1;
    if (vorbis_abi::api().ok) mask |= 2;
    return mask;
}

void bh_free(float* ptr) { std::free(ptr); }

// ---- test-fixture encoders (lame / vorbisenc), not used in production ----

// Encode mono float32 -> MP3 bytes via system libmp3lame. Returns byte count
// or -1; caller frees *out with bh_free_bytes.
int64_t bh_encode_mp3(const float* samples, size_t n, int sample_rate,
                      uint8_t** out) {
    void* lib = dlopen("libmp3lame.so.0", RTLD_NOW | RTLD_LOCAL);
    if (!lib) return -1;
    auto init = reinterpret_cast<void* (*)()>(dlsym(lib, "lame_init"));
    auto set_sr = reinterpret_cast<int (*)(void*, int)>(
        dlsym(lib, "lame_set_in_samplerate"));
    auto set_ch = reinterpret_cast<int (*)(void*, int)>(
        dlsym(lib, "lame_set_num_channels"));
    auto init_params = reinterpret_cast<int (*)(void*)>(
        dlsym(lib, "lame_init_params"));
    auto enc = reinterpret_cast<int (*)(void*, const float*, const float*, int,
                                        unsigned char*, int)>(
        dlsym(lib, "lame_encode_buffer_ieee_float"));
    auto flush = reinterpret_cast<int (*)(void*, unsigned char*, int)>(
        dlsym(lib, "lame_encode_flush"));
    auto close = reinterpret_cast<int (*)(void*)>(dlsym(lib, "lame_close"));
    if (!init || !set_sr || !set_ch || !init_params || !enc || !flush || !close)
        return -1;
    void* h = init();
    if (!h) return -1;
    set_sr(h, sample_rate);
    set_ch(h, 1);
    if (init_params(h) < 0) { close(h); return -1; }
    std::vector<uint8_t> mp3(n + (1 << 16));
    int written = enc(h, samples, samples, static_cast<int>(n), mp3.data(),
                      static_cast<int>(mp3.size()));
    if (written < 0) { close(h); return -1; }
    int tail = flush(h, mp3.data() + written,
                     static_cast<int>(mp3.size()) - written);
    close(h);
    if (tail < 0) return -1;
    const int64_t total = written + tail;
    *out = static_cast<uint8_t*>(std::malloc(total));
    if (!*out) return -1;
    std::memcpy(*out, mp3.data(), total);
    return total;
}

// Encode mono float32 -> OGG/Vorbis bytes via system libvorbis/libogg.
int64_t bh_encode_ogg(const float* samples, size_t n, int sample_rate,
                      uint8_t** out) {
    void* lv = dlopen("libvorbis.so.0", RTLD_NOW | RTLD_GLOBAL);
    void* le = dlopen("libvorbisenc.so.2", RTLD_NOW | RTLD_GLOBAL);
    void* lo = dlopen("libogg.so.0", RTLD_NOW | RTLD_GLOBAL);
    if (!lv || !le || !lo) return -1;

    struct OggPacket {  // public ogg_packet layout
        unsigned char* packet;
        long bytes, b_o_s, e_o_s;
        int64_t granulepos, packetno;
    };
    struct OggPage {  // public ogg_page layout
        unsigned char* header;
        long header_len;
        unsigned char* body;
        long body_len;
    };

    auto vi_init = reinterpret_cast<void (*)(void*)>(dlsym(lv, "vorbis_info_init"));
    auto enc_init = reinterpret_cast<int (*)(void*, long, long, float)>(
        dlsym(le, "vorbis_encode_init_vbr"));
    auto vc_init = reinterpret_cast<void (*)(void*)>(dlsym(lv, "vorbis_comment_init"));
    auto an_init = reinterpret_cast<int (*)(void*, void*)>(
        dlsym(lv, "vorbis_analysis_init"));
    auto blk_init = reinterpret_cast<int (*)(void*, void*)>(
        dlsym(lv, "vorbis_block_init"));
    auto headerout = reinterpret_cast<int (*)(void*, void*, void*, void*, void*)>(
        dlsym(lv, "vorbis_analysis_headerout"));
    auto an_buffer = reinterpret_cast<float** (*)(void*, int)>(
        dlsym(lv, "vorbis_analysis_buffer"));
    auto an_wrote = reinterpret_cast<int (*)(void*, int)>(
        dlsym(lv, "vorbis_analysis_wrote"));
    auto blockout = reinterpret_cast<int (*)(void*, void*)>(
        dlsym(lv, "vorbis_analysis_blockout"));
    auto analysis = reinterpret_cast<int (*)(void*, void*)>(
        dlsym(lv, "vorbis_analysis"));
    auto addblock = reinterpret_cast<int (*)(void*)>(
        dlsym(lv, "vorbis_bitrate_addblock"));
    auto flushpacket = reinterpret_cast<int (*)(void*, void*)>(
        dlsym(lv, "vorbis_bitrate_flushpacket"));
    auto os_init = reinterpret_cast<int (*)(void*, int)>(dlsym(lo, "ogg_stream_init"));
    auto packetin = reinterpret_cast<int (*)(void*, void*)>(
        dlsym(lo, "ogg_stream_packetin"));
    auto pageout = reinterpret_cast<int (*)(void*, void*)>(
        dlsym(lo, "ogg_stream_pageout"));
    auto os_flush = reinterpret_cast<int (*)(void*, void*)>(
        dlsym(lo, "ogg_stream_flush"));
    if (!vi_init || !enc_init || !vc_init || !an_init || !blk_init ||
        !headerout || !an_buffer || !an_wrote || !blockout || !analysis ||
        !addblock || !flushpacket || !os_init || !packetin || !pageout ||
        !os_flush)
        return -1;

    // opaque library structs: over-allocated zeroed blobs (only the library
    // reads/writes them, always by pointer)
    std::vector<uint8_t> vi(1024, 0), vc(1024, 0), vd(8192, 0), vb(8192, 0),
        os(8192, 0);
    OggPacket op{}, hdr{}, hdr_comm{}, hdr_code{};
    OggPage og{};
    std::vector<uint8_t> bytes;
    auto emit = [&](const OggPage& p) {
        bytes.insert(bytes.end(), p.header, p.header + p.header_len);
        bytes.insert(bytes.end(), p.body, p.body + p.body_len);
    };

    vi_init(vi.data());
    if (enc_init(vi.data(), 1, sample_rate, 0.4f) != 0) return -1;
    vc_init(vc.data());
    an_init(vd.data(), vi.data());
    blk_init(vd.data(), vb.data());
    os_init(os.data(), 0x42480001);
    headerout(vd.data(), vc.data(), &hdr, &hdr_comm, &hdr_code);
    packetin(os.data(), &hdr);
    packetin(os.data(), &hdr_comm);
    packetin(os.data(), &hdr_code);
    while (os_flush(os.data(), &og) != 0) emit(og);

    size_t pos = 0;
    bool eos_written = false;
    while (!eos_written) {
        const size_t chunk = std::min<size_t>(1024, n - pos);
        if (chunk == 0) {
            an_wrote(vd.data(), 0);  // signal end of stream
            eos_written = true;
        } else {
            float** buf = an_buffer(vd.data(), static_cast<int>(chunk));
            std::memcpy(buf[0], samples + pos, chunk * sizeof(float));
            an_wrote(vd.data(), static_cast<int>(chunk));
            pos += chunk;
        }
        while (blockout(vd.data(), vb.data()) == 1) {
            analysis(vb.data(), nullptr);
            addblock(vb.data());
            while (flushpacket(vd.data(), &op) == 1) {
                packetin(os.data(), &op);
                while (pageout(os.data(), &og) != 0) emit(og);
            }
        }
    }
    while (os_flush(os.data(), &og) != 0) emit(og);

    auto os_clear = reinterpret_cast<int (*)(void*)>(dlsym(lo, "ogg_stream_clear"));
    auto blk_clear = reinterpret_cast<int (*)(void*)>(dlsym(lv, "vorbis_block_clear"));
    auto dsp_clear = reinterpret_cast<void (*)(void*)>(dlsym(lv, "vorbis_dsp_clear"));
    auto vc_clear = reinterpret_cast<void (*)(void*)>(dlsym(lv, "vorbis_comment_clear"));
    auto vi_clear = reinterpret_cast<void (*)(void*)>(dlsym(lv, "vorbis_info_clear"));
    if (os_clear) os_clear(os.data());
    if (blk_clear) blk_clear(vb.data());
    if (dsp_clear) dsp_clear(vd.data());
    if (vc_clear) vc_clear(vc.data());
    if (vi_clear) vi_clear(vi.data());

    *out = static_cast<uint8_t*>(std::malloc(bytes.size()));
    if (!*out) return -1;
    std::memcpy(*out, bytes.data(), bytes.size());
    return static_cast<int64_t>(bytes.size());
}

void bh_free_bytes(uint8_t* ptr) { std::free(ptr); }

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
