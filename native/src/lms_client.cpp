// SICK LMS TCP client: connect, start continuous scan, poll telegrams.
//
// Runtime twin of the reference's lms_socket + lms_poller
// (lms_mini_lib.cpp:8-95, lms_poller.cpp:12-127): CoLa port 2111,
// "sEN LMDscandata 1" subscribes the telegram stream, frames accumulate in
// a receive buffer and are parsed as they complete.

#include <string>
#include <vector>

#include "net.h"
#include "tpu_slam_native.h"

struct ts_lms {
  tsnet::TcpClient sock;
  std::vector<uint8_t> rx;
};

extern "C" ts_lms* ts_lms_create(void) { return new ts_lms(); }

extern "C" void ts_lms_destroy(ts_lms* h) { delete h; }

extern "C" int ts_lms_connect(ts_lms* h, const char* host, int port,
                              int timeout_ms) {
  return h->sock.connect_to(host, port, timeout_ms) ? 0 : -1;
}

extern "C" int ts_lms_start_scan(ts_lms* h) {
  // Subscribe to the measurement stream (reference requestContinousScan,
  // lms_mini_lib.cpp:8-13).
  static const char req[] = "\x02sEN LMDscandata 1\x03";
  return h->sock.send_all(req, sizeof(req) - 1) ? 0 : -1;
}

extern "C" int ts_lms_poll(ts_lms* h, ts_scan_meta* meta, float* ranges_m,
                           float* intensities, int32_t cap, int timeout_ms) {
  uint8_t chunk[16384];
  for (;;) {
    // try to parse a complete frame already buffered
    size_t start, end, consumed;
    while (ts_cola_next_frame(h->rx.data(), h->rx.size(), &start, &end,
                              &consumed)) {
      int rc = ts_cola_parse_scan(h->rx.data() + start, end - start, meta,
                                  ranges_m, intensities, cap);
      h->rx.erase(h->rx.begin(), h->rx.begin() + consumed);
      if (rc != -2) return rc;  // -2 = some other telegram type; keep going
    }
    // compact dropped garbage
    if (consumed > 0) {
      h->rx.erase(h->rx.begin(), h->rx.begin() + consumed);
    }
    // overflow guard, mirroring the reference's buffer reset
    // (lms_mini_lib.cpp:78-82)
    if (h->rx.size() > (1u << 20)) h->rx.clear();

    ssize_t r = h->sock.recv_some(chunk, sizeof(chunk), timeout_ms);
    if (r == 0) return -4;   // timeout
    if (r < 0) return -5;    // connection lost
    h->rx.insert(h->rx.end(), chunk, chunk + r);
  }
}
