// Native batch gather for the packed NTL store.
//
// The training-batch host path is a strided gather from the memory-mapped
// [D, N, H, W] frame array into a contiguous [B, W, N, H, W] batch buffer
// (multimodal_outage_tpu/data/dataset.py gather_batch). Python/numpy fancy
// indexing runs it single-threaded; this library fans the per-frame memcpys
// out over a thread pool, saturating memory bandwidth (and page-cache
// readahead on cold mmaps).
//
// ABI (ctypes, see multimodal_outage_tpu/data/native.py):
//   gather_f32(src, indices, dst, n_windows, frame_elems, n_threads)
//     src        : const float*  — frame store base pointer [D * frame_elems]
//     indices    : const int64*  — n_windows frame positions
//     dst        : float*        — n_windows * frame_elems output
//     returns 0 on success.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

int gather_f32(const float* src, const std::int64_t* indices, float* dst,
               std::int64_t n_windows, std::int64_t frame_elems,
               int n_threads) {
  if (n_windows <= 0 || frame_elems <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n_windows) n_threads = static_cast<int>(n_windows);

  auto worker = [&](std::int64_t begin, std::int64_t end) {
    for (std::int64_t w = begin; w < end; ++w) {
      std::memcpy(dst + w * frame_elems, src + indices[w] * frame_elems,
                  sizeof(float) * static_cast<std::size_t>(frame_elems));
    }
  };

  if (n_threads == 1) {
    worker(0, n_windows);
    return 0;
  }

  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  const std::int64_t chunk = (n_windows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const std::int64_t begin = t * chunk;
    const std::int64_t end = begin + chunk < n_windows ? begin + chunk : n_windows;
    if (begin >= end) break;
    threads.emplace_back(worker, begin, end);
  }
  for (auto& th : threads) th.join();
  return 0;
}

// (A fused gather+normalize variant existed here; removed — both input
// paths normalize on device inside the XLA program, where the subtract/
// divide fuses into the gather for free, so a host-side normalize pass
// would only burn host CPU this machine doesn't have to spare.)

}  // extern "C"
