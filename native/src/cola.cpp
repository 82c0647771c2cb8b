// CoLa-A framing and LMDscandata parsing.
//
// Behavioral twin of the reference's lms_mini_lib.cpp telegram path
// (framing :55-83, header parse :140-242, channel parse :243-261, hex
// scaling :127-139) rebuilt from the protocol: space-separated ASCII hex
// payload between STX (0x02) and ETX (0x03); channel blocks located by
// label ("DIST1", "RSSI1"); ranges scale by 0.001 * IEEE-754 hex scale
// factor. The per-beam hex decode is the hot loop — a branch-light
// hand-rolled hex reader here instead of strtol-per-token.

#include "tpu_slam_native.h"

#include <cmath>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr uint8_t kSTX = 0x02;
constexpr uint8_t kETX = 0x03;

// Hex nibble lookup; 0xFF marks a non-hex byte.
struct HexTable {
  uint8_t v[256];
  HexTable() {
    memset(v, 0xFF, sizeof(v));
    for (int c = '0'; c <= '9'; ++c) v[c] = static_cast<uint8_t>(c - '0');
    for (int c = 'a'; c <= 'f'; ++c) v[c] = static_cast<uint8_t>(c - 'a' + 10);
    for (int c = 'A'; c <= 'F'; ++c) v[c] = static_cast<uint8_t>(c - 'A' + 10);
  }
};
const HexTable kHex;

struct Tok {
  const uint8_t* p;
  size_t n;
};

// Tokenize payload by single spaces (device emits exactly one separator).
void tokenize(const uint8_t* payload, size_t len, std::vector<Tok>* out) {
  size_t i = 0;
  while (i < len) {
    while (i < len && payload[i] == ' ') ++i;
    size_t s = i;
    while (i < len && payload[i] != ' ') ++i;
    if (i > s) out->push_back({payload + s, i - s});
  }
}

bool hex_u32(const Tok& t, uint32_t* out) {
  uint32_t v = 0;
  if (t.n == 0 || t.n > 8) return false;
  for (size_t i = 0; i < t.n; ++i) {
    uint8_t d = kHex.v[t.p[i]];
    if (d == 0xFF) return false;
    v = (v << 4) | d;
  }
  *out = v;
  return true;
}

// Signed per the token's own width (two's complement at 4*len bits),
// matching the device convention for e.g. negative start angles.
bool hex_i32(const Tok& t, int32_t* out) {
  uint32_t v;
  if (!hex_u32(t, &v)) return false;
  unsigned bits = 4u * static_cast<unsigned>(t.n);
  if (bits < 32 && (v >> (bits - 1)) & 1u) {
    v -= (1u << bits);
  }
  *out = static_cast<int32_t>(v);
  return true;
}

bool hex_f32(const Tok& t, float* out) {
  uint32_t v;
  if (!hex_u32(t, &v)) return false;
  float f;
  memcpy(&f, &v, 4);
  *out = f;
  return true;
}

bool tok_is(const Tok& t, const char* s) {
  size_t n = strlen(s);
  return t.n == n && memcmp(t.p, s, n) == 0;
}

int find_label(const std::vector<Tok>& toks, const char* label) {
  for (size_t i = 0; i < toks.size(); ++i)
    if (tok_is(toks[i], label)) return static_cast<int>(i);
  return -1;
}

}  // namespace

extern "C" int ts_cola_next_frame(const uint8_t* buf, size_t len,
                                  size_t* start, size_t* end,
                                  size_t* consumed) {
  size_t i = 0;
  while (i < len && buf[i] != kSTX) ++i;
  if (i == len) {
    *consumed = len;  // garbage only; drop everything
    return 0;
  }
  size_t s = i + 1;
  size_t j = s;
  while (j < len && buf[j] != kETX) ++j;
  if (j == len) {
    *consumed = i;  // keep from STX onward
    return 0;
  }
  *start = s;
  *end = j;
  *consumed = j + 1;
  return 1;
}

extern "C" int ts_cola_parse_scan_multi(const uint8_t* payload, size_t len,
                                        ts_scan_meta* meta, float* ranges_m,
                                        float* intensities, int32_t cap,
                                        int32_t max_echoes,
                                        int32_t* n_dist_per_echo,
                                        int32_t* n_rssi_per_echo) {
  // Multi-echo parse: DIST1..DIST{max_echoes} / RSSI1..RSSI{max_echoes}
  // (lms_mini_lib.cpp:170-208 procesChannel per label). ranges_m and
  // intensities are echo-major (max_echoes x cap) caller buffers; per-echo
  // sample counts land in n_dist_per_echo / n_rssi_per_echo (0 = channel
  // absent). DIST1 must be present; higher echoes are optional.
  if (max_echoes < 1 || max_echoes > 5) return -1;
  std::vector<Tok> toks;
  toks.reserve(len / 4);
  tokenize(payload, len, &toks);
  if (toks.size() < 19) return -1;
  if (!tok_is(toks[1], "LMDscandata")) return -2;

  uint32_t u;
  memset(meta, 0, sizeof(*meta));
  if (hex_u32(toks[7], &u)) meta->telegram_no = u;
  if (hex_u32(toks[8], &u)) meta->scan_no = u;
  if (hex_u32(toks[9], &u)) meta->time_since_startup_us = u;
  if (hex_u32(toks[10], &u)) meta->time_of_transmission_us = u;
  if (hex_u32(toks[16], &u)) meta->scan_frequency_hz = 0.01f * u;

  char label[6] = "DIST1";
  for (int32_t e = 0; e < max_echoes; ++e) {
    if (n_dist_per_echo != nullptr) n_dist_per_echo[e] = 0;
    label[4] = static_cast<char>('1' + e);
    int d = find_label(toks, label);
    if (d < 0 || d + 6 > static_cast<int>(toks.size())) {
      if (e == 0) return -1;  // first echo is mandatory
      continue;
    }
    float scale = 1.0f, scale_off = 0.0f;
    if (!hex_f32(toks[d + 1], &scale)) return -1;
    hex_f32(toks[d + 2], &scale_off);
    int32_t sa;
    if (!hex_i32(toks[d + 3], &sa)) return -1;
    uint32_t step;
    if (!hex_u32(toks[d + 4], &step)) return -1;
    uint32_t n;
    if (!hex_u32(toks[d + 5], &n)) return -1;
    if (d + 6 + static_cast<int>(n) > static_cast<int>(toks.size()))
      return -1;
    if (static_cast<int32_t>(n) > cap) return -3;
    if (e == 0) {
      meta->start_angle_deg = 1e-4f * sa;
      meta->ang_step_deg = 1e-4f * step;
      meta->scale_factor = scale;
      meta->n_dist = static_cast<int32_t>(n);
    }
    const float to_m = 0.001f * scale;  // mm -> m (lms_poller.cpp:84)
    float* out = ranges_m + static_cast<size_t>(e) * cap;
    for (uint32_t i = 0; i < n; ++i) {
      uint32_t raw;
      if (!hex_u32(toks[d + 6 + i], &raw)) return -1;
      out[i] = to_m * static_cast<float>(raw);
    }
    if (n_dist_per_echo != nullptr)
      n_dist_per_echo[e] = static_cast<int32_t>(n);
  }

  meta->n_rssi = 0;
  if (intensities == nullptr) return 0;
  char rlabel[6] = "RSSI1";
  for (int32_t e = 0; e < max_echoes; ++e) {
    if (n_rssi_per_echo != nullptr) n_rssi_per_echo[e] = 0;
    rlabel[4] = static_cast<char>('1' + e);
    int r = find_label(toks, rlabel);
    if (r < 0 || r + 6 > static_cast<int>(toks.size())) continue;
    uint32_t nr;
    if (!hex_u32(toks[r + 5], &nr) ||
        r + 6 + static_cast<int>(nr) > static_cast<int>(toks.size()) ||
        static_cast<int32_t>(nr) > cap)
      continue;
    float* out = intensities + static_cast<size_t>(e) * cap;
    for (uint32_t i = 0; i < nr; ++i) {
      uint32_t raw;
      if (!hex_u32(toks[r + 6 + i], &raw)) return -1;
      out[i] = static_cast<float>(raw);
    }
    if (e == 0) meta->n_rssi = static_cast<int32_t>(nr);
    if (n_rssi_per_echo != nullptr)
      n_rssi_per_echo[e] = static_cast<int32_t>(nr);
  }
  return 0;
}

extern "C" int ts_cola_parse_scan(const uint8_t* payload, size_t len,
                                  ts_scan_meta* meta, float* ranges_m,
                                  float* intensities, int32_t cap) {
  return ts_cola_parse_scan_multi(payload, len, meta, ranges_m, intensities,
                                  cap, 1, nullptr, nullptr);
}
