// Threaded prefetch dataset loader.
//
// The reference's drivers decode images synchronously inside the tracking
// loop (cv::imread per frame, examples/rgbd_tum.cpp:76-118,
// examples/label_instance_rgbd.cpp:84-101), serializing host I/O with
// compute. Here a pool of decode workers runs ahead of the consumer through
// a fixed ring of preallocated frame slots, so PNG/JPEG decode + pixel
// conversion overlap TPU dispatch; mutexes guard only the ring indices
// (deterministic in-order delivery — the SURVEY §2.3 "host I/O pipeline"
// component).
//
// Streams are generic: a loader carries one or two file lists (e.g. TUM
// rgb+depth, KITTI left+right) with a per-stream conversion mode:
//   0  RGB uint8 [H,W,3]        (gray replicated, 16-bit truncated)
//   1  gray uint8 [H,W]         (RGB via BT.601 luma)
//   2  float32 = raw * scale    [H,W]  (16-bit depth PNGs; TUM /5000 rule)
//   3  gray float32 [H,W]       (BT.601 luma, matches TumRgbdDataset.gray)

#include "codec.h"

#include <atomic>
#include <condition_variable>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

using ssn::DecodedImage;

size_t out_bytes(int mode, int64_t h, int64_t w) {
  switch (mode) {
    case 0: return (size_t)h * w * 3;
    case 1: return (size_t)h * w;
    default: return (size_t)h * w * 4;
  }
}

inline uint8_t luma8(uint8_t r, uint8_t g, uint8_t b) {
  // BT.601 in fixed point — matches the Python path's 0.299/0.587/0.114.
  return (uint8_t)((19595u * r + 38470u * g + 7471u * b + 32768u) >> 16);
}

// Convert a decoded image into the slot buffer for `mode`. Returns false on
// geometry mismatch (all frames of a stream must share H x W).
bool convert(const DecodedImage& im, int mode, float scale, int64_t H,
             int64_t W, uint8_t* dst) {
  if (im.h != H || im.w != W) return false;
  const int64_t n = H * W;
  const uint8_t* s8 = im.data.data();
  const uint16_t* s16 = reinterpret_cast<const uint16_t*>(im.data.data());
  const bool is16 = im.depth == 16;

  auto sample = [&](int64_t i, int ch) -> uint32_t {
    const int64_t k = i * im.c + (im.c == 3 ? ch : 0);
    return is16 ? s16[k] : s8[k];
  };

  switch (mode) {
    case 0: {  // RGB u8
      if (!is16 && im.c == 3) {
        std::memcpy(dst, s8, (size_t)n * 3);
      } else {
        for (int64_t i = 0; i < n; ++i) {
          const int sh = is16 ? 8 : 0;
          dst[i * 3 + 0] = (uint8_t)(sample(i, 0) >> sh);
          dst[i * 3 + 1] = (uint8_t)(sample(i, 1) >> sh);
          dst[i * 3 + 2] = (uint8_t)(sample(i, 2) >> sh);
        }
      }
      return true;
    }
    case 1: {  // gray u8
      if (!is16 && im.c == 1) {
        std::memcpy(dst, s8, (size_t)n);
      } else {
        for (int64_t i = 0; i < n; ++i) {
          const int sh = is16 ? 8 : 0;
          dst[i] = im.c == 3 ? luma8((uint8_t)(sample(i, 0) >> sh),
                                     (uint8_t)(sample(i, 1) >> sh),
                                     (uint8_t)(sample(i, 2) >> sh))
                             : (uint8_t)(sample(i, 0) >> sh);
        }
      }
      return true;
    }
    case 2: {  // f32 = raw * scale (depth); RGB inputs use channel 0
      float* d = reinterpret_cast<float*>(dst);
      for (int64_t i = 0; i < n; ++i) d[i] = (float)sample(i, 0) * scale;
      return true;
    }
    case 3: {  // gray f32
      float* d = reinterpret_cast<float*>(dst);
      if (im.c == 3) {
        for (int64_t i = 0; i < n; ++i)
          d[i] = 0.299f * sample(i, 0) + 0.587f * sample(i, 1) +
                 0.114f * sample(i, 2);
      } else {
        for (int64_t i = 0; i < n; ++i) d[i] = (float)sample(i, 0);
      }
      return true;
    }
  }
  return false;
}

struct Slot {
  std::vector<uint8_t> a, b;
  int64_t idx = -1;   // frame index currently held; -1 = free
  bool ready = false;
  bool error = false;
};

struct Loader {
  std::vector<std::string> paths_a, paths_b;
  int mode_a = 0, mode_b = 2;
  float scale_a = 1.0f, scale_b = 1.0f;
  int64_t H = 0, W = 0, N = 0;
  int prefetch = 8;

  std::vector<Slot> slots;
  std::mutex mu;
  std::condition_variable cv_ready;  // consumer waits for its frame
  std::condition_variable cv_free;   // workers wait for window space
  int64_t next_consume = 0;          // guarded by mu
  std::atomic<int64_t> next_fetch{0};
  bool stop = false;                 // guarded by mu
  std::vector<std::thread> workers;

  void work() {
    DecodedImage im;
    for (;;) {
      const int64_t i = next_fetch.fetch_add(1);
      if (i >= N) return;
      // Decode outside the lock.
      bool ok = ssn::decode_file(paths_a[i].c_str(), &im);
      DecodedImage im_b;
      if (ok && !paths_b.empty()) ok = ssn::decode_file(paths_b[i].c_str(), &im_b);

      Slot& s = slots[i % prefetch];
      {
        // Claim the slot once the consumer window reaches it. Frames i and
        // i+prefetch share a slot, but i+prefetch's window condition implies
        // frame i was already consumed — single live claimant per slot, so
        // the conversion below can run outside the lock.
        std::unique_lock<std::mutex> lk(mu);
        cv_free.wait(lk, [&] { return stop || i < next_consume + prefetch; });
        if (stop) return;
        s.idx = i;
        s.ready = false;
      }
      if (ok) {
        ok = convert(im, mode_a, scale_a, H, W, s.a.data());
        if (ok && !paths_b.empty())
          ok = convert(im_b, mode_b, scale_b, H, W, s.b.data());
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        s.error = !ok;
        s.ready = true;
      }
      cv_ready.notify_all();
    }
  }
};

std::vector<std::string> split_lines(const char* joined) {
  std::vector<std::string> out;
  if (!joined) return out;
  const char* p = joined;
  while (*p) {
    const char* q = std::strchr(p, '\n');
    if (!q) {
      out.emplace_back(p);
      break;
    }
    if (q != p) out.emplace_back(p, q - p);
    p = q + 1;
  }
  return out;
}

}  // namespace

extern "C" {

// paths_{a,b}: newline-joined absolute paths ('' or nullptr for no stream b).
// hw_out[2] receives {H, W} probed from the first frame of stream a.
void* ssn_loader_open(const char* paths_a, const char* paths_b, int mode_a,
                      int mode_b, float scale_a, float scale_b, int n_threads,
                      int prefetch, int64_t* hw_out) {
  auto* L = new Loader();
  L->paths_a = split_lines(paths_a);
  L->paths_b = split_lines(paths_b);
  L->N = (int64_t)L->paths_a.size();
  if (L->N == 0 || (!L->paths_b.empty() && (int64_t)L->paths_b.size() != L->N)) {
    delete L;
    return nullptr;
  }
  DecodedImage probe;
  if (!ssn::decode_file(L->paths_a[0].c_str(), &probe)) {
    delete L;
    return nullptr;
  }
  L->H = probe.h;
  L->W = probe.w;
  hw_out[0] = L->H;
  hw_out[1] = L->W;
  L->mode_a = mode_a;
  L->mode_b = mode_b;
  L->scale_a = scale_a;
  L->scale_b = scale_b;
  L->prefetch = prefetch < 2 ? 2 : prefetch;
  L->slots.resize(L->prefetch);
  for (auto& s : L->slots) {
    s.a.resize(out_bytes(mode_a, L->H, L->W));
    if (!L->paths_b.empty()) s.b.resize(out_bytes(mode_b, L->H, L->W));
  }
  const int nt = n_threads < 1 ? 1 : n_threads;
  for (int t = 0; t < nt; ++t)
    L->workers.emplace_back([L] { L->work(); });
  return L;
}

int64_t ssn_loader_len(void* h) { return static_cast<Loader*>(h)->N; }

// Blocks until frame `next_consume` is decoded; copies it out and advances.
// Returns 0 on success, 1 past end-of-stream, 2 on decode error (advances).
int ssn_loader_next(void* h, void* out_a, void* out_b) {
  auto* L = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_consume >= L->N) return 1;
  const int64_t i = L->next_consume;
  Slot& s = L->slots[i % L->prefetch];
  L->cv_ready.wait(lk, [&] { return s.ready && s.idx == i; });
  const bool err = s.error;
  if (!err) {
    std::memcpy(out_a, s.a.data(), s.a.size());
    if (out_b && !s.b.empty()) std::memcpy(out_b, s.b.data(), s.b.size());
  }
  s.idx = -1;
  s.ready = false;
  L->next_consume = i + 1;
  lk.unlock();
  L->cv_free.notify_all();
  return err ? 2 : 0;
}

void ssn_loader_close(void* h) {
  auto* L = static_cast<Loader*>(h);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
    L->next_fetch.store(L->N);
  }
  L->cv_free.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
