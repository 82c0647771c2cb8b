// Minimal POSIX stream client (TCP or serial tty) used by the device
// drivers (boost::asio-free). The reference unit speaks the same byte
// protocol over both transports (driverLib.cpp:10-47: 57600-baud serial or
// TCP :10001), so one fd-based client serves both.
#ifndef TPU_SLAM_NATIVE_NET_H_
#define TPU_SLAM_NATIVE_NET_H_

#include <arpa/inet.h>
#include <fcntl.h>
#include <netdb.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <poll.h>
#include <sys/socket.h>
#include <termios.h>
#include <unistd.h>

#include <cerrno>
#include <cstring>
#include <string>

namespace tsnet {

class TcpClient {
 public:
  TcpClient() : fd_(-1), is_socket_(true) {}
  ~TcpClient() { close_(); }

  bool connect_to(const char* host, int port, int timeout_ms) {
    close_();
    addrinfo hints{};
    hints.ai_family = AF_UNSPEC;
    hints.ai_socktype = SOCK_STREAM;
    addrinfo* res = nullptr;
    char portstr[16];
    snprintf(portstr, sizeof(portstr), "%d", port);
    if (getaddrinfo(host, portstr, &hints, &res) != 0 || !res) return false;
    int fd = socket(res->ai_family, SOCK_STREAM, 0);
    if (fd < 0) {
      freeaddrinfo(res);
      return false;
    }
    // non-blocking connect with timeout
    int flags = fcntl(fd, F_GETFL, 0);
    fcntl(fd, F_SETFL, flags | O_NONBLOCK);
    int rc = ::connect(fd, res->ai_addr, res->ai_addrlen);
    freeaddrinfo(res);
    if (rc < 0 && errno == EINPROGRESS) {
      pollfd p{fd, POLLOUT, 0};
      if (poll(&p, 1, timeout_ms) <= 0) {
        ::close(fd);
        return false;
      }
      int err = 0;
      socklen_t len = sizeof(err);
      getsockopt(fd, SOL_SOCKET, SO_ERROR, &err, &len);
      if (err != 0) {
        ::close(fd);
        return false;
      }
    } else if (rc < 0) {
      ::close(fd);
      return false;
    }
    fcntl(fd, F_SETFL, flags);  // back to blocking
    int one = 1;
    setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    fd_ = fd;
    is_socket_ = true;
    return true;
  }

  // Serial transport (driverLib.cpp:10-32: 57600 baud, 8N1, raw).
  // ``device`` is a tty path, e.g. /dev/ttyUSB0 (or a pty in tests).
  bool open_serial(const char* device, int baud) {
    close_();
    int fd = ::open(device, O_RDWR | O_NOCTTY);
    if (fd < 0) return false;
    termios tio{};
    if (tcgetattr(fd, &tio) != 0) {
      ::close(fd);
      return false;
    }
    cfmakeraw(&tio);
    tio.c_cflag |= CLOCAL | CREAD;              // 8N1, no flow control
    tio.c_cflag &= ~static_cast<tcflag_t>(CRTSCTS);
    speed_t sp = B57600;
    switch (baud) {
      case 9600: sp = B9600; break;
      case 19200: sp = B19200; break;
      case 38400: sp = B38400; break;
      case 57600: sp = B57600; break;
      case 115200: sp = B115200; break;
      default: break;                           // reference default 57600
    }
    cfsetispeed(&tio, sp);
    cfsetospeed(&tio, sp);
    tio.c_cc[VMIN] = 0;                         // poll()-driven reads
    tio.c_cc[VTIME] = 0;
    if (tcsetattr(fd, TCSANOW, &tio) != 0) {
      ::close(fd);
      return false;
    }
    fd_ = fd;
    is_socket_ = false;
    return true;
  }

  bool connected() const { return fd_ >= 0; }

  bool send_all(const void* data, size_t n) {
    const char* p = static_cast<const char*>(data);
    while (n > 0) {
      ssize_t w = is_socket_ ? ::send(fd_, p, n, MSG_NOSIGNAL)
                             : ::write(fd_, p, n);
      if (w <= 0) return false;
      p += w;
      n -= static_cast<size_t>(w);
    }
    return true;
  }

  // Read up to cap bytes with a timeout; returns bytes read, 0 on timeout,
  // -1 on error/close.
  ssize_t recv_some(void* buf, size_t cap, int timeout_ms) {
    pollfd p{fd_, POLLIN, 0};
    int rc = poll(&p, 1, timeout_ms);
    if (rc == 0) return 0;
    if (rc < 0) return -1;
    ssize_t r = is_socket_ ? ::recv(fd_, buf, cap, 0)
                           : ::read(fd_, buf, cap);
    return r <= 0 ? -1 : r;
  }

 private:
  void close_() {
    if (fd_ >= 0) ::close(fd_);
    fd_ = -1;
  }
  int fd_;
  bool is_socket_;
};

}  // namespace tsnet

#endif  // TPU_SLAM_NATIVE_NET_H_
