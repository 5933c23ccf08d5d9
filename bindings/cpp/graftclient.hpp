// Single-header C++17 client for the graft wire server — mirrors the
// reference SDK's API shape (reference bindings/cpp/include/opentick.h:
// Connection::Create / Execute / Prepare / BatchInsert / Login) over
// plain POSIX sockets, no third-party libraries.
//
// Wire format (engine/Server.scala): 4-byte little-endian length
// frames. This client negotiates the alternate JSON mode with a
// "protocol=json" first frame (the Scala and Python SDKs cover BSON).
// Request {"0": ticket, "1": cmd, "2": sql-or-prepared-id, "3": args,
// "4": useCache}; response {"0": ticket, "1": result} where a string
// result is an error. A 1-byte 'H' frame is an idle heartbeat probe,
// answered with an empty frame. Timestamps travel as [sec, nsec]
// pairs (graft::Timestamp both ways; nothing is truncated).
//
// Synchronous by design (requests pipeline per connection; this client
// sends one and reads until its ticket answers, servicing heartbeats
// in between). The async-future and scatter-gather shapes live in the
// Scala and Python SDKs.
#ifndef GRAFT_CLIENT_HPP
#define GRAFT_CLIENT_HPP

#include <arpa/inet.h>
#include <netdb.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <set>
#include <stdexcept>
#include <string>
#include <thread>
#include <variant>
#include <vector>

namespace graft {

struct Error : std::runtime_error {
  explicit Error(const std::string& m) : std::runtime_error(m) {}
};

struct Timestamp {
  int64_t sec = 0;
  int64_t nsec = 0;
  bool operator==(const Timestamp& o) const {
    return sec == o.sec && nsec == o.nsec;
  }
};

// One result cell / argument value. Monostate = SQL NULL.
using Value =
    std::variant<std::monostate, bool, int64_t, double, std::string,
                 Timestamp>;
using Row = std::vector<Value>;
using ResultSet = std::vector<Row>;
using Args = std::vector<Value>;
using Argss = std::vector<Args>;

namespace detail {

// ── minimal JSON tree (only what the wire needs) ──
struct JNode;
using JPtr = std::shared_ptr<JNode>;
struct JNode {
  enum Kind { Null, Bool, Int, Dbl, Str, Arr, Obj } kind = Null;
  bool b = false;
  int64_t i = 0;
  double d = 0;
  std::string s;
  std::vector<JPtr> arr;
  std::map<std::string, JPtr> obj;
};

inline void jsonEscape(const std::string& in, std::string& out) {
  for (char c : in) {
    switch (c) {
      case '"': out += "\\\""; break;
      case '\\': out += "\\\\"; break;
      case '\n': out += "\\n"; break;
      case '\r': out += "\\r"; break;
      case '\t': out += "\\t"; break;
      default:
        if (static_cast<unsigned char>(c) < 0x20) {
          char buf[8];
          std::snprintf(buf, sizeof buf, "\\u%04x", c);
          out += buf;
        } else {
          out += c;
        }
    }
  }
}

inline void writeValue(const Value& v, std::string& out) {
  if (std::holds_alternative<std::monostate>(v)) {
    out += "null";
  } else if (auto* b = std::get_if<bool>(&v)) {
    out += *b ? "true" : "false";
  } else if (auto* i = std::get_if<int64_t>(&v)) {
    out += std::to_string(*i);
  } else if (auto* d = std::get_if<double>(&v)) {
    char buf[32];
    std::snprintf(buf, sizeof buf, "%.17g", *d);
    out += buf;
  } else if (auto* s = std::get_if<std::string>(&v)) {
    out += '"';
    jsonEscape(*s, out);
    out += '"';
  } else if (auto* t = std::get_if<Timestamp>(&v)) {
    out += '[';
    out += std::to_string(t->sec);
    out += ',';
    out += std::to_string(t->nsec);
    out += ']';
  }
}

// recursive-descent parser over the subset the server emits
struct Parser {
  const char* p;
  const char* end;
  explicit Parser(const std::string& s) : p(s.data()), end(s.data() + s.size()) {}
  void ws() { while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t')) ++p; }
  [[noreturn]] void fail(const char* what) { throw Error(std::string("JSON parse: ") + what); }
  char peek() { ws(); if (p >= end) fail("eof"); return *p; }
  void expect(char c) { if (peek() != c) fail("unexpected char"); ++p; }

  JPtr parse() { JPtr v = value(); ws(); return v; }

  JPtr value() {
    char c = peek();
    auto n = std::make_shared<JNode>();
    if (c == '{') {
      n->kind = JNode::Obj;
      ++p;
      if (peek() == '}') { ++p; return n; }
      for (;;) {
        std::string key = str();
        expect(':');
        n->obj[key] = value();
        char d = peek(); ++p;
        if (d == '}') return n;
        if (d != ',') fail("obj sep");
      }
    }
    if (c == '[') {
      n->kind = JNode::Arr;
      ++p;
      if (peek() == ']') { ++p; return n; }
      for (;;) {
        n->arr.push_back(value());
        char d = peek(); ++p;
        if (d == ']') return n;
        if (d != ',') fail("arr sep");
      }
    }
    if (c == '"') { n->kind = JNode::Str; n->s = str(); return n; }
    if (c == 't') { lit("true"); n->kind = JNode::Bool; n->b = true; return n; }
    if (c == 'f') { lit("false"); n->kind = JNode::Bool; n->b = false; return n; }
    if (c == 'n') { lit("null"); n->kind = JNode::Null; return n; }
    return number();
  }

  void lit(const char* s) {
    size_t len = std::strlen(s);
    if (p + len > end || std::strncmp(p, s, len) != 0) fail("literal");
    p += len;
  }

  std::string str() {
    expect('"');
    std::string out;
    while (p < end && *p != '"') {
      if (*p == '\\') {
        if (++p >= end) fail("escape eof");
        switch (*p) {
          case '"': out += '"'; break;
          case '\\': out += '\\'; break;
          case '/': out += '/'; break;
          case 'n': out += '\n'; break;
          case 'r': out += '\r'; break;
          case 't': out += '\t'; break;
          case 'b': out += '\b'; break;
          case 'f': out += '\f'; break;
          case 'u': {
            if (p + 4 >= end) fail("\\u eof");
            unsigned cp = 0;
            for (int k = 0; k < 4; ++k) {
              char h = *++p;
              cp <<= 4;
              if (h >= '0' && h <= '9') cp |= h - '0';
              else if (h >= 'a' && h <= 'f') cp |= h - 'a' + 10;
              else if (h >= 'A' && h <= 'F') cp |= h - 'A' + 10;
              else fail("\\u hex");
            }
            // UTF-8 encode (surrogate pairs not needed for server text)
            if (cp < 0x80) out += static_cast<char>(cp);
            else if (cp < 0x800) {
              out += static_cast<char>(0xC0 | (cp >> 6));
              out += static_cast<char>(0x80 | (cp & 0x3F));
            } else {
              out += static_cast<char>(0xE0 | (cp >> 12));
              out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
              out += static_cast<char>(0x80 | (cp & 0x3F));
            }
            break;
          }
          default: fail("bad escape");
        }
        ++p;
      } else {
        out += *p++;
      }
    }
    expect('"');
    return out;
  }

  JPtr number() {
    const char* start = p;
    bool isDouble = false;
    if (p < end && (*p == '-' || *p == '+')) ++p;
    while (p < end && ((*p >= '0' && *p <= '9') || *p == '.' || *p == 'e' ||
                       *p == 'E' || *p == '-' || *p == '+')) {
      if (*p == '.' || *p == 'e' || *p == 'E') isDouble = true;
      ++p;
    }
    if (p == start) fail("number");
    std::string tok(start, p);
    auto n = std::make_shared<JNode>();
    if (isDouble) { n->kind = JNode::Dbl; n->d = std::stod(tok); }
    else { n->kind = JNode::Int; n->i = std::stoll(tok); }
    return n;
  }
};

// result cell decode: strictly two-level rows, a [sec, nsec] int pair
// at CELL depth is a timestamp (same rule as the Python SDK)
inline Value cellOf(const JPtr& n) {
  switch (n->kind) {
    case JNode::Null: return std::monostate{};
    case JNode::Bool: return n->b;
    case JNode::Int: return n->i;
    case JNode::Dbl: return n->d;
    case JNode::Str: return n->s;
    case JNode::Arr:
      if (n->arr.size() == 2 && n->arr[0]->kind == JNode::Int &&
          n->arr[1]->kind == JNode::Int)
        return Timestamp{n->arr[0]->i, n->arr[1]->i};
      throw Error("unexpected nested array cell");
    default: throw Error("unexpected object cell");
  }
}

}  // namespace detail

class Connection {
 public:
  using Ptr = std::shared_ptr<Connection>;

  static Ptr Create(const std::string& addr, int port,
                    const std::string& dbName = "",
                    const std::string& username = "",
                    const std::string& password = "",
                    int timeoutSec = 30) {
    Ptr c(new Connection(addr, port));
    c->timeoutSec_ = timeoutSec;
    c->Connect();
    if (!username.empty()) c->Login(username, password);
    if (!dbName.empty()) c->Use(dbName);
    return c;
  }

  ~Connection() { Close(); }

  void Close() {
    {
      std::lock_guard<std::mutex> g(mu_);
      closed_ = true;
    }
    if (fd_ >= 0) {
      ::shutdown(fd_, SHUT_RDWR);
      if (reader_.joinable()) reader_.join();
      ::close(fd_);
      fd_ = -1;
    }
    cv_.notify_all();
  }

  void Login(const std::string& user, const std::string& pass) {
    call("login", Value{user + " " + pass}, nullptr, false);
  }

  void Use(const std::string& db) { call("use", Value{db}, nullptr, false); }

  int Prepare(const std::string& sql) {
    {
      std::lock_guard<std::mutex> g(mu_);
      auto it = prepared_.find(sql);
      if (it != prepared_.end()) return it->second;
    }
    auto r = call("prepare", Value{sql}, nullptr, false);
    if (r->kind != detail::JNode::Int) throw Error("prepare: non-int id");
    std::lock_guard<std::mutex> g(mu_);
    prepared_[sql] = static_cast<int>(r->i);
    return static_cast<int>(r->i);
  }

  ResultSet Execute(const std::string& sql, const Args& args = {},
                    bool cache = false) {
    Value sqlOrId{sql};
    if (cache) sqlOrId = Value{static_cast<int64_t>(Prepare(sql))};
    auto r = call("run", sqlOrId, args.empty() ? nullptr : &args, cache);
    return rowsOf(r);
  }

  // Chunked SELECT (wire key "5"): the server streams the result as
  // chunkRows-sized same-ticket frames ({"2":1} = more follows), so
  // results past its single-frame maxWireRows bound arrive complete.
  // An error final frame voids the buffered prefix and throws.
  ResultSet ExecuteChunked(const std::string& sql, const Args& args = {},
                           int chunkRows = 10000) {
    if (chunkRows <= 0) throw Error("chunkRows must be positive");
    auto r = call("run", Value{sql}, args.empty() ? nullptr : &args, false,
                  chunkRows);
    return rowsOf(r);
  }

  void BatchInsert(const std::string& sql, const Argss& argss) {
    int pid = Prepare(sql);
    int ticket = allocTicket();
    std::string payload = "{\"0\":" + std::to_string(ticket) +
                          ",\"1\":\"batch\",\"2\":" + std::to_string(pid) +
                          ",\"3\":[";
    for (size_t r = 0; r < argss.size(); ++r) {
      if (r) payload += ',';
      payload += '[';
      for (size_t c = 0; c < argss[r].size(); ++c) {
        if (c) payload += ',';
        detail::writeValue(argss[r][c], payload);
      }
      payload += ']';
    }
    payload += "],\"4\":0}";
    writeFrame(payload);
    checkError(waitReply(ticket));
  }

  std::vector<std::string> ListDatabases() { return strList("list_databases"); }
  std::vector<std::string> ListTables() { return strList("list_tables"); }

  // (name, type) pairs: first the primary-key columns, then the values
  struct TableSchema {
    std::vector<std::pair<std::string, std::string>> keys;
    std::vector<std::pair<std::string, std::string>> values;
  };

  TableSchema Schema(const std::string& table) {
    auto r = call("meta", Value{"schema " + table}, nullptr, false);
    if (r->kind != detail::JNode::Arr || r->arr.size() != 2)
      throw Error("schema: unexpected shape");
    TableSchema out;
    for (int part = 0; part < 2; ++part) {
      auto& dst = part == 0 ? out.keys : out.values;
      for (const auto& colNode : r->arr[part]->arr) {
        if (colNode->kind != detail::JNode::Arr || colNode->arr.size() != 2)
          throw Error("schema: unexpected column shape");
        dst.emplace_back(colNode->arr[0]->s, colNode->arr[1]->s);
      }
    }
    return out;
  }

 private:
  Connection(const std::string& addr, int port) : addr_(addr), port_(port) {}

  void Connect() {
    struct addrinfo hints{};
    hints.ai_family = AF_UNSPEC;
    hints.ai_socktype = SOCK_STREAM;
    struct addrinfo* res = nullptr;
    if (::getaddrinfo(addr_.c_str(), std::to_string(port_).c_str(), &hints,
                      &res) != 0 || res == nullptr)
      throw Error("resolve failed: " + addr_);
    fd_ = ::socket(res->ai_family, res->ai_socktype, res->ai_protocol);
    if (fd_ < 0 || ::connect(fd_, res->ai_addr, res->ai_addrlen) != 0) {
      ::freeaddrinfo(res);
      Close();
      throw Error("connect failed: " + addr_ + ":" + std::to_string(port_));
    }
    ::freeaddrinfo(res);
    int one = 1;
    ::setsockopt(fd_, IPPROTO_TCP, TCP_NODELAY, &one, sizeof one);
    writeFrame("protocol=json");  // negotiate the JSON alternate mode
    // reader thread: services idle 'H' heartbeat probes (the server
    // disconnects peers that leave one unanswered) and routes replies
    // to their waiting tickets — the synchronous analog of the
    // reference client's asio read loop
    reader_ = std::thread([this] { readLoop(); });
  }

  void writeFrame(const std::string& payload) {
    std::lock_guard<std::mutex> g(wmu_);  // callers + heartbeat acks
    uint32_t n = static_cast<uint32_t>(payload.size());
    char hdr[4] = {static_cast<char>(n & 0xFF),
                   static_cast<char>((n >> 8) & 0xFF),
                   static_cast<char>((n >> 16) & 0xFF),
                   static_cast<char>((n >> 24) & 0xFF)};
    writeAll(hdr, 4);
    writeAll(payload.data(), payload.size());
  }

  void writeAll(const char* buf, size_t n) {
    while (n > 0) {
      ssize_t w = ::send(fd_, buf, n, MSG_NOSIGNAL);
      if (w <= 0) throw Error("socket write failed");
      buf += w;
      n -= static_cast<size_t>(w);
    }
  }

  std::string readFrame() {
    char hdr[4];
    readAll(hdr, 4);
    uint32_t n = (static_cast<uint32_t>(static_cast<unsigned char>(hdr[0]))) |
                 (static_cast<uint32_t>(static_cast<unsigned char>(hdr[1])) << 8) |
                 (static_cast<uint32_t>(static_cast<unsigned char>(hdr[2])) << 16) |
                 (static_cast<uint32_t>(static_cast<unsigned char>(hdr[3])) << 24);
    std::string payload(n, '\0');
    if (n > 0) readAll(payload.data(), n);
    return payload;
  }

  void readAll(char* buf, size_t n) {
    while (n > 0) {
      ssize_t r = ::recv(fd_, buf, n, 0);
      if (r <= 0) throw Error("socket read failed");
      buf += r;
      n -= static_cast<size_t>(r);
    }
  }

  // send one request; returns the "1" node of the matching reply
  detail::JPtr call(const char* cmd, const Value& sqlOrId, const Args* args,
                    bool cache, int chunkRows = 0) {
    int ticket = allocTicket();
    std::string payload = "{\"0\":" + std::to_string(ticket) + ",\"1\":\"";
    payload += cmd;
    payload += "\",\"2\":";
    detail::writeValue(sqlOrId, payload);
    payload += ",\"3\":";
    if (args == nullptr) {
      payload += "null";
    } else {
      payload += '[';
      for (size_t i = 0; i < args->size(); ++i) {
        if (i) payload += ',';
        detail::writeValue((*args)[i], payload);
      }
      payload += ']';
    }
    payload += ",\"4\":";
    payload += cache ? "1" : "0";
    if (chunkRows > 0) payload += ",\"5\":" + std::to_string(chunkRows);
    payload += '}';
    writeFrame(payload);
    return checkError(waitReply(ticket));
  }

  int allocTicket() {
    std::lock_guard<std::mutex> g(mu_);
    return nextTicket_++;
  }

  void readLoop() {
    try {
      for (;;) {
        std::string frame = readFrame();
        if (frame == "H") {
          writeFrame("");  // heartbeat ack — proves liveness while idle
          continue;
        }
        if (frame.empty()) continue;
        detail::Parser parser(frame);
        detail::JPtr doc = parser.parse();
        if (doc->kind != detail::JNode::Obj) throw Error("non-object reply");
        auto t = doc->obj.find("0");
        if (t == doc->obj.end()) continue;
        auto r = doc->obj.find("1");
        auto more = doc->obj.find("2");
        std::lock_guard<std::mutex> g(mu_);
        int ticket = static_cast<int>(t->second->i);
        if (abandoned_.erase(ticket) > 0) {
          if (more == doc->obj.end()) chunks_.erase(ticket);
          continue;  // caller already timed out — don't leak the reply
        }
        if (more != doc->obj.end() && more->second->i > 0) {
          // non-final chunk of a chunked SELECT: buffer its rows, the
          // ticket's reply stays pending
          if (r != doc->obj.end() && r->second->kind == detail::JNode::Arr) {
            auto& buf = chunks_[ticket];
            buf.insert(buf.end(), r->second->arr.begin(),
                       r->second->arr.end());
          }
          continue;
        }
        detail::JPtr fin = r == doc->obj.end()
                               ? std::make_shared<detail::JNode>()
                               : r->second;
        auto bufIt = chunks_.find(ticket);
        if (bufIt != chunks_.end()) {
          // an error-string final frame voids the buffered prefix (the
          // scan failed mid-stream); otherwise prepend the buffer
          if (fin->kind != detail::JNode::Str) {
            auto all = std::make_shared<detail::JNode>();
            all->kind = detail::JNode::Arr;
            all->arr = std::move(bufIt->second);
            if (fin->kind == detail::JNode::Arr)
              all->arr.insert(all->arr.end(), fin->arr.begin(),
                              fin->arr.end());
            fin = all;
          }
          chunks_.erase(bufIt);
        }
        replies_[ticket] = fin;
        cv_.notify_all();
      }
    } catch (const std::exception& e) {
      std::lock_guard<std::mutex> g(mu_);
      closed_ = true;
      readError_ = e.what();
      cv_.notify_all();
    }
  }

  // block until the reader routes this ticket's reply
  detail::JPtr waitReply(int ticket) {
    std::unique_lock<std::mutex> lk(mu_);
    if (!cv_.wait_for(lk, std::chrono::seconds(timeoutSec_), [&] {
          return closed_ || replies_.count(ticket) > 0;
        })) {
      abandoned_.insert(ticket);  // reader drops the late reply
      throw Error("request timed out");
    }
    auto it = replies_.find(ticket);
    if (it == replies_.end())
      throw Error("connection closed: " + readError_);
    detail::JPtr r = it->second;
    replies_.erase(it);
    return r;
  }

  detail::JPtr checkError(detail::JPtr r) {
    if (r->kind == detail::JNode::Str) throw Error(r->s);
    return r;
  }

  static ResultSet rowsOf(const detail::JPtr& r) {
    ResultSet out;
    if (r->kind != detail::JNode::Arr) return out;
    for (const auto& rowNode : r->arr) {
      if (rowNode->kind != detail::JNode::Arr)
        throw Error("non-array result row");
      Row row;
      for (const auto& cell : rowNode->arr)
        row.push_back(detail::cellOf(cell));
      out.push_back(std::move(row));
    }
    return out;
  }

  std::vector<std::string> strList(const std::string& metaCmd) {
    auto r = call("meta", Value{metaCmd}, nullptr, false);
    std::vector<std::string> out;
    if (r->kind == detail::JNode::Arr)
      for (const auto& n : r->arr)
        if (n->kind == detail::JNode::Str) out.push_back(n->s);
    return out;
  }

  std::string addr_;
  int port_;
  int fd_ = -1;
  int nextTicket_ = 1;
  std::map<std::string, int> prepared_;
  std::thread reader_;
  std::mutex wmu_;  // frame writes (requests + heartbeat acks)
  std::mutex mu_;   // tickets, replies, closed flag
  std::condition_variable cv_;
  std::map<int, detail::JPtr> replies_;
  std::map<int, std::vector<detail::JPtr>> chunks_;  // chunked-run buffers
  std::set<int> abandoned_;  // timed-out tickets whose replies to drop
  bool closed_ = false;
  std::string readError_;
  int timeoutSec_ = 30;
};

}  // namespace graft

#endif  // GRAFT_CLIENT_HPP
