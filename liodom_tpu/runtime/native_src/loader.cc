// Native data loader for liodom_tpu.
//
// The reference's runtime is C++ end to end; its ingest path is a ROS
// subscriber thread deserialising PointCloud2 into PCL buffers feeding a
// mutex FIFO (liodom_node.cc:40-55 -> shared_data.cc:37-62).  The TPU engine
// consumes fixed-shape host arrays instead, and this library is the native
// equivalent of that ingest stage: multithreaded file readers that parse
// KITTI velodyne .bin records (float32 x,y,z,intensity) straight into
// preallocated xyz buffers, decoupled from the Python interpreter by a
// bounded ring (backpressure included -- unlike the reference's unbounded
// queue).
//
// Exposed as a plain C ABI for ctypes.  Build: g++ -O3 -shared -fPIC.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// Read a whole file of float32 records; returns bytes read or -1.
long read_file(const char* path, void* out, long cap_bytes) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  long n = static_cast<long>(std::fread(out, 1, cap_bytes, f));
  std::fclose(f);
  return n;
}

struct Slot {
  std::vector<float> xyz;   // cap_points * 3
  long n_points = 0;
  long index = -1;          // sequence index held by this slot
  bool ready = false;
};

struct Prefetcher {
  std::vector<std::string> paths;
  long cap_points;
  int depth;
  std::vector<Slot> slots;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready, cv_free;
  long next_to_read = 0;     // next file index a worker may claim
  long next_to_emit = 0;     // next index the consumer wants
  std::atomic<bool> stop{false};

  Prefetcher(std::vector<std::string> p, long cap, int d, int n_threads)
      : paths(std::move(p)), cap_points(cap), depth(d), slots(d) {
    for (auto& s : slots) s.xyz.resize(static_cast<size_t>(cap) * 3);
    for (int t = 0; t < n_threads; ++t)
      workers.emplace_back([this] { this->work(); });
  }

  ~Prefetcher() {
    stop.store(true);
    cv_free.notify_all();
    cv_ready.notify_all();
    for (auto& w : workers) w.join();
  }

  void work() {
    std::vector<float> raw(static_cast<size_t>(cap_points) * 4);
    for (;;) {
      long idx;
      Slot* slot = nullptr;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_free.wait(lk, [&] {
          if (stop.load()) return true;
          if (next_to_read >= static_cast<long>(paths.size())) return true;
          // claimable: a free slot exists and the next file is within
          // `depth` of the consumer cursor (bounded look-ahead).
          if (next_to_read >= next_to_emit + depth) return false;
          for (auto& s : slots) if (s.index == -1) return true;
          return false;
        });
        if (stop.load() ||
            next_to_read >= static_cast<long>(paths.size()))
          return;
        for (auto& s : slots) {
          if (s.index == -1) { slot = &s; break; }
        }
        if (!slot) continue;
        idx = next_to_read++;
        slot->index = idx;
        slot->ready = false;
      }
      long bytes = read_file(paths[idx].c_str(), raw.data(),
                             static_cast<long>(raw.size()) * 4);
      long n = bytes < 0 ? 0 : bytes / 16;  // 4 floats per record
      for (long i = 0; i < n; ++i)
        std::memcpy(&slot->xyz[i * 3], &raw[i * 4], 3 * sizeof(float));
      {
        std::lock_guard<std::mutex> lk(mu);
        slot->n_points = n;
        slot->ready = true;
      }
      cv_ready.notify_all();
    }
  }

  // Copies scan `next_to_emit` into out (cap_points*3 floats).
  // Returns n_points, or -1 when the sequence is exhausted.
  long next(float* out) {
    std::unique_lock<std::mutex> lk(mu);
    if (next_to_emit >= static_cast<long>(paths.size())) return -1;
    long want = next_to_emit;
    Slot* slot = nullptr;
    cv_ready.wait(lk, [&] {
      if (stop.load()) return true;
      for (auto& s : slots)
        if (s.index == want && s.ready) { slot = &s; return true; }
      return false;
    });
    if (!slot) return -1;
    long n = slot->n_points;
    std::memcpy(out, slot->xyz.data(),
                static_cast<size_t>(n) * 3 * sizeof(float));
    slot->index = -1;   // release the slot back to the workers
    slot->ready = false;
    next_to_emit++;
    lk.unlock();
    cv_free.notify_all();
    return n;
  }
};

}  // namespace

extern "C" {

// Read one .bin of float32 records into out; returns floats read or -1.
long liodom_read_bin(const char* path, float* out, long cap_floats) {
  long bytes = read_file(path, out, cap_floats * 4);
  return bytes < 0 ? -1 : bytes / 4;
}

void* liodom_prefetch_create(const char** paths, long n_paths,
                             long cap_points, int depth, int n_threads) {
  std::vector<std::string> p(paths, paths + n_paths);
  return new Prefetcher(std::move(p), cap_points, depth, n_threads);
}

long liodom_prefetch_next(void* h, float* out_xyz) {
  return static_cast<Prefetcher*>(h)->next(out_xyz);
}

void liodom_prefetch_destroy(void* h) {
  delete static_cast<Prefetcher*>(h);
}

}  // extern "C"
