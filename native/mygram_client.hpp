// MygramDB-TPU C++ client library (header-only).
//
// Counterpart of the reference's MygramClient (client/mygramclient.h):
// synchronous socket client for the TCP text protocol with
// Search/Count/Get/Info and raw Command passthrough.
//
//   #include "mygram_client.hpp"
//   mygram::Client c("127.0.0.1", 11016);
//   c.Connect();
//   auto r = c.Search("articles", "hello world", 10);
//   for (auto& pk : r.ids) ...
//
// A C ABI wrapper lives in mygram_client_c.cpp (mygram_client_c.h).

#pragma once

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstring>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace mygram {

struct SearchResult {
  long total = 0;
  std::vector<std::string> ids;
  std::string raw;
};

class ClientError : public std::runtime_error {
 public:
  explicit ClientError(const std::string& msg) : std::runtime_error(msg) {}
};

class Client {
 public:
  Client(std::string host, int port, int timeout_sec = 30)
      : host_(std::move(host)), port_(port), timeout_sec_(timeout_sec) {}

  ~Client() { Close(); }

  void Connect() {
    addrinfo hints{};
    hints.ai_family = AF_UNSPEC;
    hints.ai_socktype = SOCK_STREAM;
    addrinfo* res = nullptr;
    const std::string port_str = std::to_string(port_);
    if (getaddrinfo(host_.c_str(), port_str.c_str(), &hints, &res) != 0) {
      throw ClientError("cannot resolve " + host_);
    }
    fd_ = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
    if (fd_ < 0) {
      freeaddrinfo(res);
      throw ClientError("socket() failed");
    }
    timeval tv{timeout_sec_, 0};
    setsockopt(fd_, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
    setsockopt(fd_, SOL_SOCKET, SO_SNDTIMEO, &tv, sizeof(tv));
    if (connect(fd_, res->ai_addr, res->ai_addrlen) != 0) {
      freeaddrinfo(res);
      Close();
      throw ClientError("connect to " + host_ + ":" + port_str + " failed");
    }
    freeaddrinfo(res);
  }

  void Close() {
    if (fd_ >= 0) {
      ::close(fd_);
      fd_ = -1;
    }
  }

  bool connected() const { return fd_ >= 0; }

  // Send one command line, read one response line (CRLF framed).
  std::string Command(const std::string& line) {
    if (fd_ < 0) throw ClientError("not connected");
    std::string frame = line + "\r\n";
    size_t sent = 0;
    while (sent < frame.size()) {
      ssize_t n = send(fd_, frame.data() + sent, frame.size() - sent, 0);
      if (n <= 0) throw ClientError("send failed");
      sent += static_cast<size_t>(n);
    }
    return ReadLine();
  }

  SearchResult Search(const std::string& table, const std::string& query,
                      int limit = 100) {
    std::ostringstream oss;
    oss << "SEARCH " << table << " \"" << Escape(query) << "\" LIMIT "
        << limit;
    std::string resp = Check(Command(oss.str()));
    return ParseResults(resp);
  }

  long Count(const std::string& table, const std::string& query) {
    std::string resp =
        Check(Command("COUNT " + table + " \"" + Escape(query) + "\""));
    // "OK COUNT <n>"
    auto pos = resp.rfind(' ');
    return std::stol(resp.substr(pos + 1));
  }

  std::string Get(const std::string& table, const std::string& pk) {
    return Check(Command("GET " + table + " " + pk));
  }

  bool Ping() {
    try {
      return Command("INFO").rfind("OK INFO", 0) == 0;
    } catch (const ClientError&) {
      return false;
    }
  }

 private:
  static std::string Escape(const std::string& s) {
    std::string out;
    out.reserve(s.size());
    for (char c : s) {
      if (c == '"' || c == '\\') out += '\\';
      out += c;
    }
    return out;
  }

  std::string Check(const std::string& resp) {
    if (resp.rfind("ERROR ", 0) == 0) throw ClientError(resp.substr(6));
    return resp;
  }

  static SearchResult ParseResults(const std::string& resp) {
    SearchResult r;
    r.raw = resp;
    std::istringstream iss(resp);
    std::string ok, results;
    iss >> ok >> results >> r.total;
    std::string pk;
    while (iss >> pk) r.ids.push_back(pk);
    return r;
  }

  std::string ReadLine() {
    std::string line;
    char ch = 0;
    while (true) {
      ssize_t n = recv(fd_, &ch, 1, 0);
      if (n <= 0) throw ClientError("connection closed or timeout");
      if (ch == '\n') break;
      if (ch != '\r') line += ch;
    }
    return line;
  }

  std::string host_;
  int port_;
  int timeout_sec_;
  int fd_ = -1;
};

}  // namespace mygram
