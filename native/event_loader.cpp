// Native event-stream loader + framer.
//
// Plays the role of the reference's event ingestion path: the rosbag
// transport + events_repacking_helper re-chunker
// (events_repacking_helper/src/EventMessageEditor.cpp:95-121) and the
// per-callback event buffering in the nodes (esvo_Mapping.cpp:690-718).
// Parsing multi-GB `events.txt` files with Python (np.loadtxt) is 50-100x
// slower than this loop; framing is a per-tick binary search + memcpy.
//
// C ABI consumed through ctypes (esvo_tpu/io/native.py). No ROS, no
// globals; handles are heap objects.
//
// Build: g++ -O3 -march=native -shared -fPIC event_loader.cpp -o libevent_loader.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <algorithm>

namespace {

struct EventStream {
  std::vector<double> t;
  std::vector<int32_t> x;
  std::vector<int32_t> y;
  std::vector<uint8_t> p;
};

// Parse one "t x y p" line; returns false unless ALL four fields are
// present (a truncated line must not fabricate zeroed fields).
static bool parse_event_line(const char* line, double* tv, long* xv,
                             long* yv, long* pv) {
  char* cur = const_cast<char*>(line);
  char* prev = cur;
  *tv = std::strtod(cur, &cur);
  if (cur == prev) return false;
  prev = cur;
  *xv = std::strtol(cur, &cur, 10);
  if (cur == prev) return false;
  prev = cur;
  *yv = std::strtol(cur, &cur, 10);
  if (cur == prev) return false;
  prev = cur;
  *pv = std::strtol(cur, &cur, 10);
  return cur != prev;
}

}  // namespace

extern "C" {

// Parse a DAVIS text file "t x y p" per line. Returns a handle (or null).
void* el_load_txt(const char* path, int64_t max_events, int64_t* n_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto* s = new EventStream();
  s->t.reserve(1 << 20);
  s->x.reserve(1 << 20);
  s->y.reserve(1 << 20);
  s->p.reserve(1 << 20);

  // buffered line parsing with strtod — robust to extra whitespace
  constexpr size_t kBuf = 1 << 20;
  std::vector<char> buf(kBuf);
  std::string carry;
  while (true) {
    size_t nread = std::fread(buf.data(), 1, kBuf - 1, f);
    if (nread == 0) break;
    buf[nread] = '\0';
    const char* ptr = buf.data();
    const char* end = buf.data() + nread;
    while (ptr < end) {
      char* nl = static_cast<char*>(
          const_cast<void*>(std::memchr(ptr, '\n', end - ptr)));
      const char* line_start = ptr;
      std::string tmp;
      if (!nl) {  // partial line -> carry to next read
        carry.append(ptr, end - ptr);
        break;
      }
      // bound parsing at the line: strtod/strtol skip '\n' as
      // whitespace, so a malformed 3-field line would otherwise steal
      // the NEXT line's leading number as its polarity
      *nl = '\0';
      if (!carry.empty()) {
        carry.append(ptr, nl - ptr);
        tmp = carry;
        carry.clear();
        line_start = tmp.c_str();
      }
      double tv;
      long xv, yv, pv;
      if (parse_event_line(line_start, &tv, &xv, &yv, &pv)) {
        s->t.push_back(tv);
        s->x.push_back(static_cast<int32_t>(xv));
        s->y.push_back(static_cast<int32_t>(yv));
        s->p.push_back(static_cast<uint8_t>(pv > 0));
        if (max_events > 0 &&
            static_cast<int64_t>(s->t.size()) >= max_events) {
          goto done;
        }
      }
      ptr = nl + 1;
    }
  }
  // file ended without a trailing newline: parse the carried partial line
  if (!carry.empty() &&
      (max_events <= 0 ||
       static_cast<int64_t>(s->t.size()) < max_events)) {
    double tv;
    long xv, yv, pv;
    if (parse_event_line(carry.c_str(), &tv, &xv, &yv, &pv)) {
      s->t.push_back(tv);
      s->x.push_back(static_cast<int32_t>(xv));
      s->y.push_back(static_cast<int32_t>(yv));
      s->p.push_back(static_cast<uint8_t>(pv > 0));
    }
  }
done:
  std::fclose(f);
  *n_out = static_cast<int64_t>(s->t.size());
  return s;
}

// Wrap caller-owned arrays (no copy of semantics; data is copied in).
void* el_from_arrays(const double* t, const int32_t* x, const int32_t* y,
                     const uint8_t* p, int64_t n) {
  auto* s = new EventStream();
  s->t.assign(t, t + n);
  s->x.assign(x, x + n);
  s->y.assign(y, y + n);
  s->p.assign(p, p + n);
  return s;
}

int64_t el_size(void* handle) {
  return static_cast<int64_t>(static_cast<EventStream*>(handle)->t.size());
}

// Copy the raw arrays out (caller allocates n-sized buffers).
void el_read(void* handle, double* t, int32_t* x, int32_t* y, uint8_t* p) {
  auto* s = static_cast<EventStream*>(handle);
  std::memcpy(t, s->t.data(), s->t.size() * sizeof(double));
  std::memcpy(x, s->x.data(), s->x.size() * sizeof(int32_t));
  std::memcpy(y, s->y.data(), s->y.size() * sizeof(int32_t));
  std::memcpy(p, s->p.data(), s->p.size() * sizeof(uint8_t));
}

// Frame events into K fixed-capacity bins: bin k holds events with
// t in (sync[k-1], sync[k]]; overflow dropped (counted in `dropped`).
// Output buffers are (K * capacity) caller-allocated; valid/p are uint8.
void el_frame(void* handle, const double* sync_times, int64_t K,
              int64_t capacity, int32_t* x_out, int32_t* y_out,
              float* t_out, uint8_t* p_out, uint8_t* valid_out,
              int32_t* dropped_out) {
  auto* s = static_cast<EventStream*>(handle);
  const auto& tv = s->t;
  std::memset(valid_out, 0, K * capacity);
  std::memset(x_out, 0, K * capacity * sizeof(int32_t));
  std::memset(y_out, 0, K * capacity * sizeof(int32_t));
  std::memset(t_out, 0, K * capacity * sizeof(float));
  std::memset(p_out, 0, K * capacity);
  double prev = -1e300;
  for (int64_t k = 0; k < K; ++k) {
    double hi = sync_times[k];
    auto lo_it = std::upper_bound(tv.begin(), tv.end(), prev);
    auto hi_it = std::upper_bound(tv.begin(), tv.end(), hi);
    int64_t lo = lo_it - tv.begin();
    int64_t cnt = hi_it - lo_it;
    int64_t n = std::min<int64_t>(cnt, capacity);
    dropped_out[k] = static_cast<int32_t>(cnt - n);
    for (int64_t i = 0; i < n; ++i) {
      x_out[k * capacity + i] = s->x[lo + i];
      y_out[k * capacity + i] = s->y[lo + i];
      t_out[k * capacity + i] = static_cast<float>(s->t[lo + i]);
      p_out[k * capacity + i] = s->p[lo + i];
      valid_out[k * capacity + i] = 1;
    }
    prev = hi;
  }
}

void el_free(void* handle) { delete static_cast<EventStream*>(handle); }

}  // extern "C"
