// C ABI wrapper over the C++ client (reference mygramclient_c.h analog).
// Build: g++ -O2 -std=c++17 -shared -fPIC -o libmygram_client.so \
//            mygram_client_c.cpp

#include <cstring>
#include <string>

#include "mygram_client.hpp"

extern "C" {

struct mg_client;  // opaque

mg_client* mg_client_new(const char* host, int port, int timeout_sec) {
  try {
    return reinterpret_cast<mg_client*>(
        new mygram::Client(host ? host : "127.0.0.1", port, timeout_sec));
  } catch (...) {
    return nullptr;
  }
}

void mg_client_free(mg_client* c) {
  delete reinterpret_cast<mygram::Client*>(c);
}

int mg_client_connect(mg_client* c) {
  try {
    reinterpret_cast<mygram::Client*>(c)->Connect();
    return 0;
  } catch (const std::exception&) {
    return -1;
  }
}

void mg_client_close(mg_client* c) {
  reinterpret_cast<mygram::Client*>(c)->Close();
}

// Runs a raw command; writes the response into out (NUL-terminated,
// truncated to out_cap). Returns 0 on OK response, 1 on ERROR response,
// -1 on transport failure.
int mg_client_command(mg_client* c, const char* line, char* out,
                      size_t out_cap) {
  try {
    std::string resp =
        reinterpret_cast<mygram::Client*>(c)->Command(line ? line : "");
    if (out && out_cap) {
      size_t n = resp.size() < out_cap - 1 ? resp.size() : out_cap - 1;
      std::memcpy(out, resp.data(), n);
      out[n] = '\0';
    }
    return resp.rfind("ERROR ", 0) == 0 ? 1 : 0;
  } catch (const std::exception& e) {
    if (out && out_cap) {
      std::snprintf(out, out_cap, "transport error: %s", e.what());
    }
    return -1;
  }
}

long mg_client_count(mg_client* c, const char* table, const char* query) {
  try {
    return reinterpret_cast<mygram::Client*>(c)->Count(table, query);
  } catch (const std::exception&) {
    return -1;
  }
}

}  // extern "C"
