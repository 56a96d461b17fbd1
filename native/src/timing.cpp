// Native per-phase timing registry.
//
// Rebuild of the reference's frame-loop instrumentation: std::chrono
// timestamps around each phase, per-phase sample vectors, and an exit-time
// average report (reference: main.cpp:168-173, 326-373, 384-392). Kept in
// C++ so hot frame loops (app/viewer.py) record samples without touching
// the Python allocator; the report formats exactly one line per phase like
// the reference's cout summary.
//
// C ABI:
//   rt_timer_new() -> handle
//   rt_timer_free(handle)
//   rt_timer_phase_begin(handle, name) / rt_timer_phase_end(handle, name)
//   rt_timer_record(handle, name, seconds)
//   rt_timer_report(handle, out, cap) -> bytes written
//   rt_timer_avg(handle, name) -> average seconds (nan if no samples)

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <vector>

namespace {

using Clock = std::chrono::high_resolution_clock;  // as main.cpp:326

struct Timer {
  std::mutex mu;
  std::map<std::string, std::vector<double>> samples;
  std::map<std::string, Clock::time_point> open;
};

}  // namespace

extern "C" {

void* rt_timer_new() { return new Timer(); }

void rt_timer_free(void* h) { delete static_cast<Timer*>(h); }

void rt_timer_phase_begin(void* h, const char* name) {
  auto* t = static_cast<Timer*>(h);
  std::lock_guard<std::mutex> lock(t->mu);
  t->open[name] = Clock::now();
}

void rt_timer_phase_end(void* h, const char* name) {
  auto* t = static_cast<Timer*>(h);
  const auto now = Clock::now();
  std::lock_guard<std::mutex> lock(t->mu);
  auto it = t->open.find(name);
  if (it == t->open.end()) return;
  t->samples[name].push_back(
      std::chrono::duration<double>(now - it->second).count());
  t->open.erase(it);
}

void rt_timer_record(void* h, const char* name, double seconds) {
  auto* t = static_cast<Timer*>(h);
  std::lock_guard<std::mutex> lock(t->mu);
  t->samples[name].push_back(seconds);
}

double rt_timer_avg(void* h, const char* name) {
  auto* t = static_cast<Timer*>(h);
  std::lock_guard<std::mutex> lock(t->mu);
  auto it = t->samples.find(name);
  if (it == t->samples.end() || it->second.empty()) return NAN;
  double sum = 0;
  for (double s : it->second) sum += s;
  return sum / double(it->second.size());
}

// One line per phase, mirroring the reference exit report (main.cpp:386-391).
long rt_timer_report(void* h, char* out, long cap) {
  auto* t = static_cast<Timer*>(h);
  std::lock_guard<std::mutex> lock(t->mu);
  long written = 0;
  for (const auto& [name, v] : t->samples) {
    if (v.empty()) continue;
    double sum = 0;
    for (double s : v) sum += s;
    const double avg_ms = sum / double(v.size()) * 1e3;
    int n = snprintf(out + written, size_t(cap - written),
                     "average %s time: %.3f ms (%zu samples)\n", name.c_str(),
                     avg_ms, v.size());
    if (n < 0 || written + n >= cap) break;
    written += n;
  }
  return written;
}

}  // extern "C"
