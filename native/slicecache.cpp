// slicecache — memory-mapped paired-slice cache with multithreaded batch
// assembly.
//
// The reference's data hot path is np.savez_compressed per slice + torch
// DataLoader workers (slicedMRI/transform_to_2D_slices.py:148,
// ResDif_execution.ipynb cell 24).  Decompressing npz per __getitem__ costs
// more than the host->device copy it feeds; this engine instead stores
// slices uncompressed in one mmap'd file so a training batch is a handful of
// page-faults + memcpys, fanned out across threads.  Exposed to Python via
// ctypes (mrisr_tpu/data/slicecache.py) — no pybind11 dependency.
//
// File layout (little-endian):
//   magic  u64  = 0x534c43414348453ULL ("SLCACHE"-ish)
//   n      u64  number of slice pairs
//   h, w   u32  slice height/width
//   dtype  u32  0 = float32 (only supported value for now)
//   payload: n * 2 * h * w float32 (lr then hr per pair, contiguous)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

constexpr uint64_t kMagic = 0x534c43414348453ULL;

struct Header {
  uint64_t magic;
  uint64_t n;
  uint32_t h;
  uint32_t w;
  uint32_t dtype;
  uint32_t pad;
};

struct Cache {
  int fd = -1;
  uint8_t* base = nullptr;
  size_t size = 0;
  Header hdr{};
  bool writable = false;

  const float* pair(size_t idx) const {
    return reinterpret_cast<const float*>(base + sizeof(Header)) +
           idx * 2ull * hdr.h * hdr.w;
  }
  float* pair_mut(size_t idx) {
    return const_cast<float*>(pair(idx));
  }
};

size_t payload_bytes(uint64_t n, uint32_t h, uint32_t w) {
  return sizeof(Header) + n * 2ull * h * w * sizeof(float);
}

}  // namespace

extern "C" {

// Create a new cache file sized for n pairs of h*w float32 slices.
// Returns an opaque handle or nullptr.
void* sc_create(const char* path, uint64_t n, uint32_t h, uint32_t w) {
  int fd = ::open(path, O_RDWR | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return nullptr;
  size_t size = payload_bytes(n, h, w);
  if (::ftruncate(fd, static_cast<off_t>(size)) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = ::mmap(nullptr, size, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* c = new Cache();
  c->fd = fd;
  c->base = static_cast<uint8_t*>(base);
  c->size = size;
  c->hdr = Header{kMagic, n, h, w, 0, 0};
  c->writable = true;
  std::memcpy(c->base, &c->hdr, sizeof(Header));
  return c;
}

void* sc_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st{};
  if (::fstat(fd, &st) != 0 || static_cast<size_t>(st.st_size) < sizeof(Header)) {
    ::close(fd);
    return nullptr;
  }
  void* base = ::mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* c = new Cache();
  c->fd = fd;
  c->base = static_cast<uint8_t*>(base);
  c->size = st.st_size;
  std::memcpy(&c->hdr, c->base, sizeof(Header));
  if (c->hdr.magic != kMagic ||
      payload_bytes(c->hdr.n, c->hdr.h, c->hdr.w) > c->size) {
    ::munmap(base, st.st_size);
    ::close(fd);
    delete c;
    return nullptr;
  }
  return c;
}

uint64_t sc_num_slices(void* handle) {
  return handle ? static_cast<Cache*>(handle)->hdr.n : 0;
}
uint32_t sc_height(void* handle) {
  return handle ? static_cast<Cache*>(handle)->hdr.h : 0;
}
uint32_t sc_width(void* handle) {
  return handle ? static_cast<Cache*>(handle)->hdr.w : 0;
}

// Write one lr/hr pair at index idx.  Returns 0 on success.
int sc_write(void* handle, uint64_t idx, const float* lr, const float* hr) {
  auto* c = static_cast<Cache*>(handle);
  if (!c || !c->writable || idx >= c->hdr.n) return -1;
  size_t plane = static_cast<size_t>(c->hdr.h) * c->hdr.w;
  float* dst = c->pair_mut(idx);
  std::memcpy(dst, lr, plane * sizeof(float));
  std::memcpy(dst + plane, hr, plane * sizeof(float));
  return 0;
}

// Gather a batch: indices[count] -> out_lr/out_hr [count, h, w] contiguous.
// Fans the copies out over up to `threads` std::threads (0 = hardware).
int sc_get_batch(void* handle, const uint64_t* indices, uint64_t count,
                 float* out_lr, float* out_hr, uint32_t threads) {
  auto* c = static_cast<Cache*>(handle);
  if (!c) return -1;
  size_t plane = static_cast<size_t>(c->hdr.h) * c->hdr.w;
  for (uint64_t i = 0; i < count; ++i)
    if (indices[i] >= c->hdr.n) return -2;

  uint32_t nthreads = threads ? threads : std::thread::hardware_concurrency();
  if (nthreads > count) nthreads = static_cast<uint32_t>(count);
  if (nthreads <= 1) {
    for (uint64_t i = 0; i < count; ++i) {
      const float* src = c->pair(indices[i]);
      std::memcpy(out_lr + i * plane, src, plane * sizeof(float));
      std::memcpy(out_hr + i * plane, src + plane, plane * sizeof(float));
    }
    return 0;
  }
  std::vector<std::thread> pool;
  pool.reserve(nthreads);
  for (uint32_t t = 0; t < nthreads; ++t) {
    pool.emplace_back([=]() {
      for (uint64_t i = t; i < count; i += nthreads) {
        const float* src = c->pair(indices[i]);
        std::memcpy(out_lr + i * plane, src, plane * sizeof(float));
        std::memcpy(out_hr + i * plane, src + plane, plane * sizeof(float));
      }
    });
  }
  for (auto& th : pool) th.join();
  return 0;
}

void sc_close(void* handle) {
  auto* c = static_cast<Cache*>(handle);
  if (!c) return;
  if (c->base) ::munmap(c->base, c->size);
  if (c->fd >= 0) ::close(c->fd);
  delete c;
}

}  // extern "C"
