// kvcached-tpu native core: page/block allocator + shm control plane.
//
// TPU-native functional equivalent of the reference's C++ layer
// (csrc/page_allocator.cpp, csrc/inc/mem_info_tracker.hpp): the GPU VMM
// layers (gpu_vmm.hpp, page.cpp, ftensor.cpp) have no TPU analogue — "map"
// here is a write into a caller-owned int32 page table (the indirection the
// Pallas kernels consume) plus an optional host callback for multi-process /
// multi-host broadcast.  Exposed as a C ABI consumed via ctypes
// (kvcached_tpu/core/native.py); no pybind dependency.
//
// Unlike the reference, the *block* bookkeeping (the reference keeps
// InternalPage in C++ but the block-level manager in Python,
// kvcached/kv_cache_manager.py) also lives here: the measured hot paths —
// available_size (12.5x), group_indices_by_page (3x), multi-thread
// alloc/free (5.7x) — all cross the block layer, so the whole decode-path
// state machine is native.
//
// Lock discipline: one mutex per allocator; user callbacks (which may
// re-enter Python and take the GIL) are ALWAYS invoked with the mutex
// released, to avoid GIL/mutex lock-order inversion.

#include <algorithm>
#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/file.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <sys/syscall.h>
#include <unistd.h>

#include <cstdio>
#include <cstdlib>

// ---------------------------------------------------------------------------
// Leveled logging (reference: csrc/inc/gpu_utils.hpp LOGGER + the µs timing
// the reference applies to every alloc/free/map path,
// csrc/page_allocator.cpp:162-185).  Gated by KVCACHED_LOG_LEVEL
// (DEBUG|INFO|WARN|ERROR, default WARN); zero cost when below level.
// ---------------------------------------------------------------------------

static int kvc_log_level() {
  static int lvl = [] {
    const char* e = getenv("KVCACHED_LOG_LEVEL");
    if (!e) return 2;
    std::string s(e);
    for (auto& c : s) c = (char)tolower(c);
    if (s == "debug" || s == "0") return 0;
    if (s == "info" || s == "1") return 1;
    if (s == "warn" || s == "warning" || s == "2") return 2;
    return 3;
  }();
  return lvl;
}

static int64_t kvc_now_us() {
  return std::chrono::duration_cast<std::chrono::microseconds>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

#define KVC_LOG(lvl, fmt, ...)                                               \
  do {                                                                       \
    if ((lvl) >= kvc_log_level())                                            \
      fprintf(stderr, "[kvcached-core %s pid=%d tid=%ld] " fmt "\n",         \
              (lvl) == 0   ? "DEBUG"                                         \
              : (lvl) == 1 ? "INFO"                                          \
              : (lvl) == 2 ? "WARN"                                          \
                           : "ERROR",                                        \
              getpid(), (long)syscall(SYS_gettid), ##__VA_ARGS__);           \
  } while (0)

extern "C" {

typedef void (*kvc_map_cb)(const int32_t* vpages, const int32_t* ppages,
                           int64_t n, void* user);

// ---------------------------------------------------------------------------
// Physical page pool (free-list over the device pool arena; page 0 = zero
// page, never handed out).  Shared by all colocated allocators/groups.
// ---------------------------------------------------------------------------

struct KvcPool {
  std::mutex m;
  std::deque<int32_t> free_pages;
  int64_t capacity;
};

void* kvc_pool_create(int64_t capacity) {
  auto* p = new KvcPool();
  p->capacity = capacity;
  for (int64_t i = 1; i < capacity; ++i) p->free_pages.push_back((int32_t)i);
  return p;
}

void kvc_pool_destroy(void* pool) { delete (KvcPool*)pool; }

int64_t kvc_pool_avail(void* pool) {
  auto* p = (KvcPool*)pool;
  std::lock_guard<std::mutex> g(p->m);
  return (int64_t)p->free_pages.size();
}

int64_t kvc_pool_capacity(void* pool) { return ((KvcPool*)pool)->capacity; }

// Returns 1 on success (ids written to out), 0 if insufficient.
int kvc_pool_acquire(void* pool, int64_t n, int32_t* out) {
  auto* p = (KvcPool*)pool;
  std::lock_guard<std::mutex> g(p->m);
  if ((int64_t)p->free_pages.size() < n) return 0;
  for (int64_t i = 0; i < n; ++i) {
    out[i] = p->free_pages.front();
    p->free_pages.pop_front();
  }
  return 1;
}

void kvc_pool_release(void* pool, const int32_t* ids, int64_t n) {
  auto* p = (KvcPool*)pool;
  std::lock_guard<std::mutex> g(p->m);
  for (int64_t i = 0; i < n; ++i) p->free_pages.push_back(ids[i]);
}

// ---------------------------------------------------------------------------
// shm MemInfo control plane: {total, used, prealloc} int64s under flock.
// Functional twin of the reference's RwLockedShm/MemInfoTracker.
// ---------------------------------------------------------------------------

static const size_t kShmSize = 3 * sizeof(int64_t);

struct ShmSeg {
  std::string path;
};

static int shm_rw(const char* path, bool write, int64_t vals[3], int64_t set_mask) {
  // set_mask bits: 1=total, 2=used, 4=prealloc. Read-modify-write under flock.
  int flags = write ? (O_RDWR | O_CREAT) : O_RDONLY;
  int fd = open(path, flags, 0666);
  if (fd < 0) return -1;
  if (write) {
    struct stat st;
    if (fstat(fd, &st) == 0 && (size_t)st.st_size < kShmSize) {
      if (ftruncate(fd, kShmSize) != 0) { close(fd); return -1; }
    }
  }
  if (flock(fd, write ? LOCK_EX : LOCK_SH) != 0) { close(fd); return -1; }
  void* mm = mmap(nullptr, kShmSize, PROT_READ | (write ? PROT_WRITE : 0),
                  MAP_SHARED, fd, 0);
  if (mm == MAP_FAILED) { flock(fd, LOCK_UN); close(fd); return -1; }
  int64_t cur[3];
  memcpy(cur, mm, kShmSize);
  if (write) {
    if (set_mask & 1) cur[0] = vals[0];
    if (set_mask & 2) cur[1] = vals[1];
    if (set_mask & 4) cur[2] = vals[2];
    memcpy(mm, cur, kShmSize);
    msync(mm, kShmSize, MS_SYNC);
  }
  memcpy(vals, cur, kShmSize);
  munmap(mm, kShmSize);
  flock(fd, LOCK_UN);
  close(fd);
  return 0;
}

void* kvc_shm_open(const char* path) { return new ShmSeg{path}; }
void kvc_shm_close(void* seg) { delete (ShmSeg*)seg; }

int kvc_shm_read(void* seg, int64_t out[3]) {
  return shm_rw(((ShmSeg*)seg)->path.c_str(), false, out, 0);
}

int kvc_shm_write_limit(void* seg, int64_t total) {
  int64_t v[3] = {total, 0, 0};
  return shm_rw(((ShmSeg*)seg)->path.c_str(), true, v, 1);
}

int kvc_shm_write_usage(void* seg, int64_t used, int64_t prealloc) {
  int64_t v[3] = {0, used, prealloc};
  return shm_rw(((ShmSeg*)seg)->path.c_str(), true, v, 6);
}

int kvc_shm_init(void* seg, int64_t total) {
  int64_t v[3] = {total, 0, 0};
  return shm_rw(((ShmSeg*)seg)->path.c_str(), true, v, 7);
}

// ---------------------------------------------------------------------------
// Elastic allocator: virtual page space + block manager.
// ---------------------------------------------------------------------------

struct PageBlocks {
  std::vector<int32_t> free_slots;  // slot offsets within the page
};

struct KvcAlloc {
  KvcPool* pool;
  int64_t virtual_pages, bpp, page_bytes;
  int32_t* page_table;  // caller-owned (numpy buffer), len >= virtual_pages

  std::mutex m;
  std::condition_variable cv;
  std::deque<int32_t> free_v, reserved, reclaimed;
  int64_t in_use = 0, num_mapped = 0, limit_pages;
  int64_t peak_in_use = 0;  // high-water mark (exact, not sampled)

  // block manager
  std::unordered_map<int32_t, PageBlocks> avail_pages;  // pages w/ free slots
  std::unordered_map<int32_t, PageBlocks> full_pages;
  std::vector<int64_t> reserved_blocks;
  bool in_shrink = false;
  int64_t target_blocks = -1;

  // hooks (invoked OUTSIDE the mutex)
  kvc_map_cb map_cb = nullptr, unmap_cb = nullptr;
  void* user = nullptr;

  // threads
  std::thread prealloc_th, watcher_th;
  std::atomic<bool> stop{false};
  int min_reserved = 5, max_reserved = 10;

  // shm
  ShmSeg* seg = nullptr;
  std::atomic<int64_t> resize_target{-1};
  int64_t last_total = -1;
  int poll_ms = 100;
};

static void notify_cb(kvc_map_cb cb, void* user,
                      const std::vector<int32_t>& v,
                      const std::vector<int32_t>& p) {
  if (cb && !v.empty()) cb(v.data(), p.data(), (int64_t)v.size(), user);
}

// requires lock; fills (v,p) for the deferred callback
static bool map_pages_locked(KvcAlloc* a, const std::vector<int32_t>& vps,
                             std::vector<int32_t>* cb_v, std::vector<int32_t>* cb_p) {
  std::vector<int32_t> pps(vps.size());
  if (!kvc_pool_acquire(a->pool, (int64_t)vps.size(), pps.data())) return false;
  for (size_t i = 0; i < vps.size(); ++i) a->page_table[vps[i]] = pps[i];
  a->num_mapped += (int64_t)vps.size();
  cb_v->insert(cb_v->end(), vps.begin(), vps.end());
  cb_p->insert(cb_p->end(), pps.begin(), pps.end());
  return true;
}

static void unmap_pages_locked(KvcAlloc* a, const std::vector<int32_t>& vps,
                               std::vector<int32_t>* cb_v, std::vector<int32_t>* cb_p,
                               std::vector<int32_t>* to_release) {
  for (int32_t vp : vps) {
    int32_t pp = a->page_table[vp];
    a->page_table[vp] = 0;
    cb_v->push_back(vp);
    cb_p->push_back(pp);
    to_release->push_back(pp);
  }
  a->num_mapped -= (int64_t)vps.size();
}

static void update_shm_locked(KvcAlloc* a) {
  if (!a->seg) return;
  int64_t used = a->in_use * a->page_bytes;
  int64_t pre = (int64_t)a->reserved.size() * a->page_bytes;
  int64_t v[3] = {0, used, pre};
  shm_rw(a->seg->path.c_str(), true, v, 6);
}

static int64_t avail_page_slots_locked(KvcAlloc* a) {
  int64_t virt = a->limit_pages - a->in_use;
  if (virt < 0) virt = 0;
  int64_t phys = kvc_pool_avail(a->pool) + (int64_t)a->reserved.size();
  return std::min(virt, phys);
}

static void prealloc_loop(KvcAlloc* a);
static void watcher_loop(KvcAlloc* a);

void* kvc_alloc_create(void* pool, int64_t virtual_pages, int64_t blocks_per_page,
                       int64_t page_bytes, int32_t* page_table,
                       const char* shm_path, int64_t shm_total,
                       int enable_prealloc, int min_reserved, int max_reserved,
                       int poll_ms) {
  auto* a = new KvcAlloc();
  a->pool = (KvcPool*)pool;
  a->virtual_pages = virtual_pages;
  a->bpp = blocks_per_page;
  a->page_bytes = page_bytes;
  a->page_table = page_table;
  a->limit_pages = virtual_pages;
  a->min_reserved = min_reserved;
  a->max_reserved = max_reserved;
  a->poll_ms = poll_ms;
  for (int64_t i = 0; i < virtual_pages; ++i) a->free_v.push_back((int32_t)i);
  if (shm_path && shm_path[0]) {
    a->seg = new ShmSeg{shm_path};
    kvc_shm_init(a->seg, shm_total);
    a->last_total = shm_total;
    a->watcher_th = std::thread(watcher_loop, a);
  }
  if (enable_prealloc) a->prealloc_th = std::thread(prealloc_loop, a);
  return a;
}

void kvc_set_hooks(void* alloc, kvc_map_cb map_cb, kvc_map_cb unmap_cb, void* user) {
  auto* a = (KvcAlloc*)alloc;
  std::lock_guard<std::mutex> g(a->m);
  a->map_cb = map_cb;
  a->unmap_cb = unmap_cb;
  a->user = user;
}

void kvc_alloc_destroy(void* alloc) {
  auto* a = (KvcAlloc*)alloc;
  a->stop.store(true);
  a->cv.notify_all();
  if (a->prealloc_th.joinable()) a->prealloc_th.join();
  if (a->watcher_th.joinable()) a->watcher_th.join();
  if (a->seg) {
    unlink(a->seg->path.c_str());
    delete a->seg;
  }
  delete a;
}

// --------------------------------------------------------------- accounting

int64_t kvc_available_blocks(void* alloc) {
  auto* a = (KvcAlloc*)alloc;
  std::lock_guard<std::mutex> g(a->m);
  int64_t partial = 0;
  for (auto& kv : a->avail_pages) partial += (int64_t)kv.second.free_slots.size();
  return partial + (int64_t)a->reserved_blocks.size() +
         avail_page_slots_locked(a) * a->bpp;
}

int64_t kvc_mapped_bytes(void* alloc) {
  auto* a = (KvcAlloc*)alloc;
  std::lock_guard<std::mutex> g(a->m);
  return a->num_mapped * a->page_bytes;
}

int64_t kvc_in_use_pages(void* alloc) {
  auto* a = (KvcAlloc*)alloc;
  std::lock_guard<std::mutex> g(a->m);
  return a->in_use;
}

int64_t kvc_peak_in_use_pages(void* alloc) {
  auto* a = (KvcAlloc*)alloc;
  std::lock_guard<std::mutex> g(a->m);
  return a->peak_in_use;
}

void kvc_reset_peak_in_use(void* alloc) {
  auto* a = (KvcAlloc*)alloc;
  std::lock_guard<std::mutex> g(a->m);
  a->peak_in_use = a->in_use;
}

int64_t kvc_reserved_pages(void* alloc) {
  auto* a = (KvcAlloc*)alloc;
  std::lock_guard<std::mutex> g(a->m);
  return (int64_t)a->reserved.size();
}

int64_t kvc_limit_pages(void* alloc) {
  auto* a = (KvcAlloc*)alloc;
  std::lock_guard<std::mutex> g(a->m);
  return a->limit_pages;
}

int kvc_in_shrink(void* alloc) {
  auto* a = (KvcAlloc*)alloc;
  std::lock_guard<std::mutex> g(a->m);
  return a->in_shrink ? 1 : 0;
}

// ------------------------------------------------------------- resize/trim

static int resize_locked(KvcAlloc* a, int64_t new_bytes,
                         std::vector<int32_t>* cb_v, std::vector<int32_t>* cb_p,
                         std::vector<int32_t>* to_release) {
  int64_t new_limit = new_bytes / a->page_bytes;
  if (new_limit > a->virtual_pages) new_limit = a->virtual_pages;
  if (new_limit < 0) new_limit = 0;
  int64_t cur = a->limit_pages;
  if (new_limit == cur) { a->in_shrink = false; a->target_blocks = -1; return 1; }
  if (new_limit > cur) {
    int64_t need = new_limit - cur;
    while (need > 0 && !a->reclaimed.empty()) {
      a->free_v.push_back(a->reclaimed.front());
      a->reclaimed.pop_front();
      --need;
    }
    a->limit_pages = new_limit;
    a->in_shrink = false;
    a->target_blocks = -1;
    update_shm_locked(a);
    return 1;
  }
  int64_t shrink = cur - new_limit;
  int64_t take = std::min(shrink, (int64_t)a->free_v.size());
  for (int64_t i = 0; i < take; ++i) {
    a->reclaimed.push_back(a->free_v.back());
    a->free_v.pop_back();
  }
  shrink -= take;
  if (shrink > 0 && !a->reserved.empty()) {
    int64_t t2 = std::min(shrink, (int64_t)a->reserved.size());
    std::vector<int32_t> pages;
    for (int64_t i = 0; i < t2; ++i) {
      pages.push_back(a->reserved.back());
      a->reserved.pop_back();
    }
    unmap_pages_locked(a, pages, cb_v, cb_p, to_release);
    for (int32_t vp : pages) a->reclaimed.push_back(vp);
    shrink -= t2;
  }
  a->limit_pages = new_limit;
  if (shrink == 0) {
    a->in_shrink = false;
    a->target_blocks = -1;
    update_shm_locked(a);
    return 1;
  }
  a->in_shrink = true;
  a->target_blocks = new_limit * a->bpp;
  update_shm_locked(a);
  return 0;
}

int kvc_resize(void* alloc, int64_t new_bytes) {
  auto* a = (KvcAlloc*)alloc;
  std::vector<int32_t> cb_v, cb_p, rel;
  int ok;
  kvc_map_cb ucb; void* user;
  int64_t t0 = kvc_log_level() <= 1 ? kvc_now_us() : 0;
  int64_t new_limit;
  {
    std::lock_guard<std::mutex> g(a->m);
    ok = resize_locked(a, new_bytes, &cb_v, &cb_p, &rel);
    new_limit = a->limit_pages;
    ucb = a->unmap_cb; user = a->user;
  }
  if (!rel.empty()) kvc_pool_release(a->pool, rel.data(), (int64_t)rel.size());
  notify_cb(ucb, user, cb_v, cb_p);
  if (t0)
    KVC_LOG(1, "resize -> %lld bytes (limit=%lld pages) %s unmapped=%zu %lldus",
            (long long)new_bytes, (long long)new_limit,
            ok ? "done" : "deferred", cb_v.size(),
            (long long)(kvc_now_us() - t0));
  return ok;
}

static void trim_locked(KvcAlloc* a, std::vector<int32_t>* cb_v,
                        std::vector<int32_t>* cb_p, std::vector<int32_t>* rel) {
  if (a->reserved.empty()) return;
  std::vector<int32_t> pages(a->reserved.begin(), a->reserved.end());
  a->reserved.clear();
  unmap_pages_locked(a, pages, cb_v, cb_p, rel);
  for (int32_t vp : pages) a->free_v.push_back(vp);
  update_shm_locked(a);
}

void kvc_trim(void* alloc) {
  auto* a = (KvcAlloc*)alloc;
  std::vector<int32_t> cb_v, cb_p, rel;
  kvc_map_cb ucb; void* user;
  {
    std::lock_guard<std::mutex> g(a->m);
    trim_locked(a, &cb_v, &cb_p, &rel);
    ucb = a->unmap_cb; user = a->user;
  }
  if (!rel.empty()) kvc_pool_release(a->pool, rel.data(), (int64_t)rel.size());
  notify_cb(ucb, user, cb_v, cb_p);
}

void kvc_reset(void* alloc) {
  auto* a = (KvcAlloc*)alloc;
  std::vector<int32_t> cb_v, cb_p, rel;
  kvc_map_cb ucb; void* user;
  {
    std::lock_guard<std::mutex> g(a->m);
    trim_locked(a, &cb_v, &cb_p, &rel);
    std::sort(a->free_v.begin(), a->free_v.end());
    std::sort(a->reclaimed.begin(), a->reclaimed.end());
    ucb = a->unmap_cb; user = a->user;
  }
  if (!rel.empty()) kvc_pool_release(a->pool, rel.data(), (int64_t)rel.size());
  notify_cb(ucb, user, cb_v, cb_p);
}

// ------------------------------------------------------------- block alloc

// Returns number of blocks written to out, or -1 if the request cannot be
// satisfied (no partial allocations escape).
int64_t kvc_alloc_blocks(void* alloc, int64_t n, int64_t* out) {
  auto* a = (KvcAlloc*)alloc;
  std::vector<int32_t> cb_v, cb_p;
  kvc_map_cb mcb; void* user;
  int64_t written = 0;
  int64_t t0 = kvc_log_level() <= 0 ? kvc_now_us() : 0;
  {
    std::unique_lock<std::mutex> g(a->m);
    // apply operator resize target first (watcher thread publishes it)
    int64_t tgt = a->resize_target.exchange(-1);
    if (tgt >= 0) {
      std::vector<int32_t> ucb_v, ucb_p, rel;
      resize_locked(a, tgt, &ucb_v, &ucb_p, &rel);
      // release/notify after unlock via merge
      if (!rel.empty()) {
        g.unlock();
        kvc_pool_release(a->pool, rel.data(), (int64_t)rel.size());
        notify_cb(a->unmap_cb, a->user, ucb_v, ucb_p);
        g.lock();
      }
    }
    // availability check
    int64_t partial = 0;
    for (auto& kv : a->avail_pages) partial += (int64_t)kv.second.free_slots.size();
    int64_t avail = partial + (int64_t)a->reserved_blocks.size() +
                    avail_page_slots_locked(a) * a->bpp;
    if (avail < n) {
      KVC_LOG(0, "alloc_blocks n=%lld REFUSED avail=%lld", (long long)n,
              (long long)avail);
      return -1;
    }

    // 1) reserved blocks
    int64_t take = std::min<int64_t>(n, (int64_t)a->reserved_blocks.size());
    for (int64_t i = 0; i < take; ++i) out[written++] = a->reserved_blocks[i];
    a->reserved_blocks.erase(a->reserved_blocks.begin(),
                             a->reserved_blocks.begin() + take);

    // 2) partially-used pages, then fresh pages
    while (written < n) {
      int32_t vp;
      PageBlocks* pb;
      if (!a->avail_pages.empty()) {
        auto it = a->avail_pages.begin();
        vp = it->first;
        pb = &it->second;
      } else {
        // fresh page: reserved pool fast path, else map inline
        if (!a->reserved.empty()) {
          vp = a->reserved.front();
          a->reserved.pop_front();
          a->cv.notify_all();
        } else if (!a->free_v.empty() && a->in_use < a->limit_pages) {
          vp = a->free_v.front();
          a->free_v.pop_front();
          std::vector<int32_t> one{vp};
          if (!map_pages_locked(a, one, &cb_v, &cb_p)) {
            a->free_v.push_front(vp);
            // roll back: park blocks allocated so far as reserved
            // (rare physical race; callers retry).  Pages mapped earlier in
            // THIS call stay mapped (their page-table entries were written
            // and their blocks parked), so the map hook MUST still fire or
            // TP/multi-host page-table mirrors silently miss the mapping.
            for (int64_t i = 0; i < written; ++i)
              a->reserved_blocks.push_back(out[i]);
            mcb = a->map_cb; user = a->user;
            g.unlock();
            notify_cb(mcb, user, cb_v, cb_p);
            KVC_LOG(2, "alloc_blocks n=%lld FAILED (pool race), %zu pages "
                       "mapped+parked", (long long)n, cb_v.size());
            return -1;
          }
        } else {
          for (int64_t i = 0; i < written; ++i)
            a->reserved_blocks.push_back(out[i]);
          mcb = a->map_cb; user = a->user;
          g.unlock();
          notify_cb(mcb, user, cb_v, cb_p);
          KVC_LOG(0, "alloc_blocks n=%lld FAILED (limit), %zu pages "
                     "mapped+parked", (long long)n, cb_v.size());
          return -1;
        }
        a->in_use += 1;
        if (a->in_use > a->peak_in_use) a->peak_in_use = a->in_use;
        auto res = a->avail_pages.emplace(vp, PageBlocks{});
        pb = &res.first->second;
        pb->free_slots.reserve(a->bpp);
        for (int64_t s = a->bpp - 1; s >= 0; --s)
          pb->free_slots.push_back((int32_t)s);
      }
      while (written < n && !pb->free_slots.empty()) {
        int32_t s = pb->free_slots.back();
        pb->free_slots.pop_back();
        out[written++] = (int64_t)vp * a->bpp + s;
      }
      if (pb->free_slots.empty()) {
        a->full_pages.emplace(vp, std::move(*pb));
        a->avail_pages.erase(vp);
      }
    }
    update_shm_locked(a);
    mcb = a->map_cb; user = a->user;
  }
  notify_cb(mcb, user, cb_v, cb_p);
  if (t0)
    KVC_LOG(0, "alloc_blocks n=%lld ok mapped=%zu %lldus", (long long)n,
            cb_v.size(), (long long)(kvc_now_us() - t0));
  return written;
}

void kvc_free_blocks(void* alloc, const int64_t* ids, int64_t n) {
  auto* a = (KvcAlloc*)alloc;
  std::vector<int32_t> cb_v, cb_p, rel;
  kvc_map_cb ucb; void* user;
  int64_t t0 = kvc_log_level() <= 0 ? kvc_now_us() : 0;
  {
    std::lock_guard<std::mutex> g(a->m);
    // group by page (native group_indices_by_page)
    std::unordered_map<int32_t, std::vector<int32_t>> grouped;
    grouped.reserve(n / a->bpp + 1);
    for (int64_t i = 0; i < n; ++i) {
      grouped[(int32_t)(ids[i] / a->bpp)].push_back((int32_t)(ids[i] % a->bpp));
    }
    std::vector<int32_t> empties;
    for (auto& kv : grouped) {
      int32_t vp = kv.first;
      auto it = a->avail_pages.find(vp);
      PageBlocks* pb;
      if (it != a->avail_pages.end()) {
        pb = &it->second;
      } else {
        auto itf = a->full_pages.find(vp);
        if (itf == a->full_pages.end()) continue;  // unknown page (caller bug)
        auto moved = a->avail_pages.emplace(vp, std::move(itf->second));
        a->full_pages.erase(itf);
        pb = &moved.first->second;
      }
      for (int32_t s : kv.second) pb->free_slots.push_back(s);
      if ((int64_t)pb->free_slots.size() == a->bpp) {
        a->avail_pages.erase(vp);
        empties.push_back(vp);
      }
    }
    // free empty pages: refill reserved up to max, unmap the rest
    std::vector<int32_t> to_unmap;
    for (int32_t vp : empties) {
      a->in_use -= 1;
      if ((int64_t)a->reserved.size() < a->max_reserved)
        a->reserved.push_back(vp);
      else
        to_unmap.push_back(vp);
    }
    if (!to_unmap.empty()) {
      unmap_pages_locked(a, to_unmap, &cb_v, &cb_p, &rel);
      for (int32_t vp : to_unmap) a->free_v.push_back(vp);
    }
    // deferred shrink completion
    if (a->in_shrink && a->in_use * a->bpp <= a->target_blocks) {
      trim_locked(a, &cb_v, &cb_p, &rel);
      a->in_shrink = false;
      a->target_blocks = -1;
    }
    update_shm_locked(a);
    ucb = a->unmap_cb; user = a->user;
  }
  if (!rel.empty()) kvc_pool_release(a->pool, rel.data(), (int64_t)rel.size());
  notify_cb(ucb, user, cb_v, cb_p);
  if (t0)
    KVC_LOG(0, "free_blocks n=%lld unmapped=%zu %lldus", (long long)n,
            cb_v.size(), (long long)(kvc_now_us() - t0));
}

int kvc_try_to_reserve(void* alloc, int64_t n) {
  auto* a = (KvcAlloc*)alloc;
  std::vector<int64_t> tmp(n);
  int64_t got = kvc_alloc_blocks(alloc, n, tmp.data());
  if (got < 0) return 0;
  std::lock_guard<std::mutex> g(a->m);
  a->reserved_blocks.insert(a->reserved_blocks.end(), tmp.begin(), tmp.end());
  return 1;
}

// Moves reserved blocks into out (caller then frees them); returns count.
int64_t kvc_take_reserved_blocks(void* alloc, int64_t* out, int64_t cap) {
  auto* a = (KvcAlloc*)alloc;
  std::lock_guard<std::mutex> g(a->m);
  int64_t n = std::min<int64_t>(cap, (int64_t)a->reserved_blocks.size());
  for (int64_t i = 0; i < n; ++i) out[i] = a->reserved_blocks[i];
  a->reserved_blocks.erase(a->reserved_blocks.begin(),
                           a->reserved_blocks.begin() + n);
  return n;
}

int64_t kvc_num_reserved_blocks(void* alloc) {
  auto* a = (KvcAlloc*)alloc;
  std::lock_guard<std::mutex> g(a->m);
  return (int64_t)a->reserved_blocks.size();
}

// Enumerate all live (allocated) blocks; returns count written.
int64_t kvc_used_blocks(void* alloc, int64_t* out, int64_t cap) {
  auto* a = (KvcAlloc*)alloc;
  std::lock_guard<std::mutex> g(a->m);
  int64_t w = 0;
  auto emit = [&](int32_t vp, const PageBlocks& pb) {
    std::vector<bool> freeb(a->bpp, false);
    for (int32_t s : pb.free_slots) freeb[s] = true;
    for (int64_t s = 0; s < a->bpp; ++s)
      if (!freeb[s] && w < cap) out[w++] = (int64_t)vp * a->bpp + s;
  };
  for (auto& kv : a->avail_pages) emit(kv.first, kv.second);
  for (auto& kv : a->full_pages) emit(kv.first, kv.second);
  return w;
}

// --------------------------------------------------------------- threads

static void prealloc_loop(KvcAlloc* a) {
  while (!a->stop.load()) {
    std::vector<int32_t> cb_v, cb_p;
    kvc_map_cb mcb = nullptr; void* user = nullptr;
    {
      std::unique_lock<std::mutex> g(a->m);
      a->cv.wait_for(g, std::chrono::milliseconds(50));
      if (a->stop.load()) return;
      if ((int64_t)a->reserved.size() >= a->min_reserved) continue;
      int64_t room = a->limit_pages - a->in_use - (int64_t)a->reserved.size();
      int64_t want = std::min<int64_t>(
          {a->max_reserved - (int64_t)a->reserved.size(),
           (int64_t)a->free_v.size(), room, kvc_pool_avail(a->pool)});
      if (want <= 0) continue;
      std::vector<int32_t> vps;
      for (int64_t i = 0; i < want; ++i) {
        vps.push_back(a->free_v.front());
        a->free_v.pop_front();
      }
      if (map_pages_locked(a, vps, &cb_v, &cb_p)) {
        for (int32_t vp : vps) a->reserved.push_back(vp);
        KVC_LOG(0, "prealloc mapped %zu pages (reserved=%zu)", vps.size(),
                a->reserved.size());
      } else {
        for (auto it = vps.rbegin(); it != vps.rend(); ++it)
          a->free_v.push_front(*it);
        KVC_LOG(0, "prealloc map of %zu pages failed (pool exhausted)",
                vps.size());
      }
      update_shm_locked(a);
      mcb = a->map_cb; user = a->user;
    }
    notify_cb(mcb, user, cb_v, cb_p);
  }
}

static void watcher_loop(KvcAlloc* a) {
  while (!a->stop.load()) {
    std::this_thread::sleep_for(std::chrono::milliseconds(a->poll_ms));
    if (a->stop.load()) return;
    int64_t v[3] = {0, 0, 0};
    if (shm_rw(a->seg->path.c_str(), false, v, 0) != 0) continue;
    if (v[0] > 0 && v[0] != a->last_total) {
      a->last_total = v[0];
      a->resize_target.store(v[0]);
      KVC_LOG(1, "shm limit changed -> %lld bytes (resize target published)",
              (long long)v[0]);
    }
  }
}

// Force a resize-target poll result (used by tests and by callers that want
// synchronous behavior).
void kvc_publish_resize_target(void* alloc, int64_t bytes) {
  ((KvcAlloc*)alloc)->resize_target.store(bytes);
}

int64_t kvc_version(void) { return 1; }

}  // extern "C"
