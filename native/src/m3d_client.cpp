// Rotating-unit motor controller client (the driver_m3d runtime twin).
//
// ASCII CANopen-style parameter protocol over TCP port 10001
// (driverLib.cpp): write "sp <idx>h.<sub>h <val>\n" and read the ack;
// read "gp <idx>h.<sub>h\n" and parse the 4-field space-separated reply
// with the decimal value in field 2 (driverLib.cpp:145-163). Command
// sequences (speed/position/homing) reproduce the reference's parameter
// writes exactly; the angle/encoder math preserves SURVEY.md §7.4 item 5.

#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "net.h"
#include "tpu_slam_native.h"

struct ts_m3d {
  tsnet::TcpClient sock;
  int enc_res = -1;
  int timeout_ms = 1000;
};

namespace {

bool transact(ts_m3d* h, const std::string& cmd, std::string* reply) {
  if (!h->sock.connected()) return false;
  if (!h->sock.send_all(cmd.data(), cmd.size())) return false;
  char buf[512];
  ssize_t r = h->sock.recv_some(buf, sizeof(buf), h->timeout_ms);
  if (r <= 0) return false;
  reply->assign(buf, static_cast<size_t>(r));
  return true;
}

}  // namespace

extern "C" ts_m3d* ts_m3d_create(void) { return new ts_m3d(); }

extern "C" void ts_m3d_destroy(ts_m3d* h) { delete h; }

extern "C" int ts_m3d_connect_tcp(ts_m3d* h, const char* host, int port,
                                  int timeout_ms) {
  h->timeout_ms = timeout_ms;
  if (!h->sock.connect_to(host, port, timeout_ms)) return -1;
  // The reference reads the encoder resolution right after connecting
  // (driverLib.cpp:49-52); same here so getAngle works immediately.
  int res;
  if (ts_m3d_get_encoder_res(h, &res) != 0) return -2;
  return 0;
}

extern "C" int ts_m3d_connect_serial(ts_m3d* h, const char* device, int baud,
                                     int timeout_ms) {
  h->timeout_ms = timeout_ms;
  if (!h->sock.open_serial(device, baud)) return -1;
  int res;
  if (ts_m3d_get_encoder_res(h, &res) != 0) return -2;
  return 0;
}

extern "C" int ts_m3d_write_param(ts_m3d* h, int index, int subindex,
                                  int value) {
  char cmd[96];
  snprintf(cmd, sizeof(cmd), "sp %xh.%xh %d\n", index, subindex, value);
  std::string reply;
  return transact(h, cmd, &reply) ? 0 : -1;
}

extern "C" int ts_m3d_get_param(ts_m3d* h, int index, int subindex,
                                int* value) {
  char cmd[64];
  snprintf(cmd, sizeof(cmd), "gp %xh.%xh\n", index, subindex);
  std::string reply;
  if (!transact(h, cmd, &reply)) return -1;
  // reply: 4 space-separated fields, decimal value at index 2
  // (driverLib.cpp:145-163)
  std::vector<std::string> fields;
  size_t i = 0;
  while (i <= reply.size()) {
    size_t j = reply.find(' ', i);
    if (j == std::string::npos) {
      fields.push_back(reply.substr(i));
      break;
    }
    fields.push_back(reply.substr(i, j - i));
    i = j + 1;
  }
  if (fields.size() != 4) return -2;
  char* endp = nullptr;
  long v = strtol(fields[2].c_str(), &endp, 10);
  if (endp == fields[2].c_str()) return -3;
  *value = static_cast<int>(v);
  return 0;
}

extern "C" int ts_m3d_set_speed(ts_m3d* h, int speed) {
  // velocity mode, speed, stop, start (driverLib.cpp:242-261)
  if (ts_m3d_write_param(h, 0x3003, 0x0, 3)) return -1;
  if (ts_m3d_write_param(h, 0x3000, 0x10, speed)) return -1;
  if (ts_m3d_write_param(h, 0x3000, 0x1, 0)) return -1;
  if (ts_m3d_write_param(h, 0x3000, 0x1, 49)) return -1;
  return 0;
}

extern "C" int ts_m3d_set_position(ts_m3d* h, double pos_rad, int speed,
                                   int relative) {
  if (h->enc_res <= 0) return -2;
  // position mode 7, speed, target ticks, stop, start 51/52
  // (driverLib.cpp:173-199)
  if (ts_m3d_write_param(h, 0x3003, 0x0, 7)) return -1;
  if (ts_m3d_write_param(h, 0x3000, 0x10, speed)) return -1;
  int ticks = static_cast<int>(pos_rad / (2.0 * M_PI) * h->enc_res);
  if (ts_m3d_write_param(h, 0x3000, 0x11, ticks)) return -1;
  if (ts_m3d_write_param(h, 0x3000, 0x1, 0)) return -1;
  if (ts_m3d_write_param(h, 0x3000, 0x1, relative ? 51 : 52)) return -1;
  return 0;
}

extern "C" int ts_m3d_get_encoder_res(ts_m3d* h, int* enc_res) {
  int v;
  // enc_res = 4 * controller value (driverLib.cpp:230-241)
  if (ts_m3d_get_param(h, 0x3962, 0x0, &v)) return -1;
  h->enc_res = 4 * v;
  *enc_res = h->enc_res;
  return 0;
}

extern "C" int ts_m3d_get_angle(ts_m3d* h, double* angle_rad) {
  if (h->enc_res <= 0) return -2;
  int v;
  if (ts_m3d_get_param(h, 0x396A, 0x0, &v)) return -1;
  // angle = -2*pi*(ticks mod res)/res (driverLib.cpp:202-217)
  v = v % h->enc_res;
  *angle_rad = -2.0 * M_PI * static_cast<double>(v) / h->enc_res;
  return 0;
}

extern "C" int ts_m3d_get_voltage(ts_m3d* h, int* value) {
  return ts_m3d_get_param(h, 0x3962, 0x0, value) ? -1 : 0;
}

extern "C" int ts_m3d_set_homing_offset(ts_m3d* h, int offset) {
  // homing offset + EEPROM save "save" magic (setoffset.cpp:61-70)
  if (ts_m3d_write_param(h, 0x37B3, 0x00, offset)) return -1;
  if (ts_m3d_write_param(h, 0x1010, 0x01, 0x65766173)) return -1;
  return 0;
}
