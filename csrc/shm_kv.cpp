// Native shared-memory parameter KV — the runtime analogue of the
// reference's SysV shm hashtable (util/shm_hashtable.h: multi-prime
// open addressing in shared memory, CAS updates — "shared parameters
// KV store in physical nodes", README.md:12).
//
// TPU-native role: a same-host handoff between a trainer process and
// serving processes — fresh embedding/weight rows become visible to
// readers without file round trips. Design:
//   - POSIX shm_open + mmap (named /dev/shm segments instead of SysV
//     keys; unlink-able, permission-scoped)
//   - open addressing, linear probing; slot = {key int64, version
//     uint32, float value[dim]}
//   - key claim by __atomic CAS on the key field (EMPTY = -1), so
//     concurrent writers of DIFFERENT keys never collide
//   - per-slot seqlock: writers bump version to odd, write the row,
//     bump to even; readers retry while the version is odd or changes
//     mid-read — torn reads are impossible even with a concurrent
//     writer on the SAME key
//
// Python binds via ctypes (lightctr_tpu/utils/shm_kv.py), same pattern
// as the libffm parser bindings.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr int64_t kEmpty = -1;
constexpr uint64_t kMagic = 0x4C435452534B5631ULL;  // "LCTRSKV1"

struct Header {
  uint64_t magic;
  uint64_t capacity;
  uint64_t dim;
  std::atomic<uint64_t> count;
};

struct Handle {
  Header* hdr;
  uint8_t* slots;    // capacity * slot_bytes
  size_t slot_bytes; // 8 (key) + 4 (version) + 4*dim, rounded to 8
  int fd;
  char name[256];
};

inline size_t slot_bytes_for(uint64_t dim) {
  size_t b = 8 + 4 + 4 * dim;
  return (b + 7) & ~size_t(7);
}

inline int64_t* slot_key(Handle* h, uint64_t i) {
  return reinterpret_cast<int64_t*>(h->slots + i * h->slot_bytes);
}
inline uint32_t* slot_ver(Handle* h, uint64_t i) {
  return reinterpret_cast<uint32_t*>(h->slots + i * h->slot_bytes + 8);
}
inline float* slot_val(Handle* h, uint64_t i) {
  return reinterpret_cast<float*>(h->slots + i * h->slot_bytes + 12);
}

inline uint64_t mix(uint64_t k) {  // splitmix64 finalizer
  k += 0x9e3779b97f4a7c15ULL;
  k = (k ^ (k >> 30)) * 0xbf58476d1ce4e5b9ULL;
  k = (k ^ (k >> 27)) * 0x94d049bb133111ebULL;
  return k ^ (k >> 31);
}

}  // namespace

extern "C" {

// create != 0: create-or-truncate; otherwise open existing (capacity
// and dim must match). Returns NULL on failure.
void* shmkv_open(const char* name, uint64_t capacity, uint64_t dim,
                 int create) {
  int flags = create ? (O_CREAT | O_RDWR) : O_RDWR;
  int fd = shm_open(name, flags, 0600);
  if (fd < 0) return nullptr;
  size_t sb = slot_bytes_for(dim);
  size_t total = sizeof(Header) + capacity * sb;
  if (create) {
    if (ftruncate(fd, (off_t)total) != 0) { close(fd); return nullptr; }
  } else {
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
    total = (size_t)st.st_size;
  }
  void* mem = mmap(nullptr, total, PROT_READ | PROT_WRITE, MAP_SHARED,
                   fd, 0);
  if (mem == MAP_FAILED) { close(fd); return nullptr; }
  Header* hdr = reinterpret_cast<Header*>(mem);
  if (create) {
    hdr->magic = 0;  // not valid until slots are cleared
    hdr->capacity = capacity;
    hdr->dim = dim;
    hdr->count.store(0);
    uint8_t* slots = reinterpret_cast<uint8_t*>(mem) + sizeof(Header);
    for (uint64_t i = 0; i < capacity; i++) {
      *reinterpret_cast<int64_t*>(slots + i * sb) = kEmpty;
      *reinterpret_cast<uint32_t*>(slots + i * sb + 8) = 0;
    }
    __atomic_store_n(&hdr->magic, kMagic, __ATOMIC_RELEASE);
  } else {
    if (__atomic_load_n(&hdr->magic, __ATOMIC_ACQUIRE) != kMagic ||
        (capacity && hdr->capacity != capacity) ||
        (dim && hdr->dim != dim)) {
      munmap(mem, total);
      close(fd);
      return nullptr;
    }
  }
  Handle* h = new Handle();
  h->hdr = hdr;
  h->slots = reinterpret_cast<uint8_t*>(mem) + sizeof(Header);
  h->slot_bytes = slot_bytes_for(hdr->dim);
  h->fd = fd;
  snprintf(h->name, sizeof(h->name), "%s", name);
  return h;
}

uint64_t shmkv_capacity(void* hv) {
  return reinterpret_cast<Handle*>(hv)->hdr->capacity;
}
uint64_t shmkv_dim(void* hv) {
  return reinterpret_cast<Handle*>(hv)->hdr->dim;
}
uint64_t shmkv_count(void* hv) {
  return reinterpret_cast<Handle*>(hv)->hdr->count.load();
}

// Insert-or-update. Returns 0 ok, -1 table full, -2 reserved key.
// key == -1 is the EMPTY slot sentinel: a put would CAS -1 -> -1
// (trivially succeeding and bumping count on EVERY call) and a get
// would stop at the first "empty" probe — reject it outright.
int shmkv_put(void* hv, int64_t key, const float* val) {
  if (key == kEmpty) return -2;
  Handle* h = reinterpret_cast<Handle*>(hv);
  uint64_t cap = h->hdr->capacity, dim = h->hdr->dim;
  uint64_t i = mix((uint64_t)key) % cap;
  for (uint64_t probe = 0; probe < cap; probe++, i = (i + 1) % cap) {
    int64_t cur = __atomic_load_n(slot_key(h, i), __ATOMIC_ACQUIRE);
    if (cur == kEmpty) {
      int64_t expected = kEmpty;
      if (__atomic_compare_exchange_n(slot_key(h, i), &expected, key, false,
                                      __ATOMIC_ACQ_REL, __ATOMIC_ACQUIRE)) {
        h->hdr->count.fetch_add(1);
        cur = key;
      } else {
        cur = expected;  // another writer claimed it
      }
    }
    if (cur == key) {
      uint32_t* ver = slot_ver(h, i);
      uint32_t v = __atomic_fetch_add(ver, 1, __ATOMIC_ACQ_REL);  // -> odd
      (void)v;
      memcpy(slot_val(h, i), val, 4 * dim);
      __atomic_fetch_add(ver, 1, __ATOMIC_RELEASE);               // -> even
      return 0;
    }
  }
  return -1;
}

// Returns 1 found (row copied to out), 0 missing (incl. the reserved
// EMPTY sentinel key -1, which can never be stored).
int shmkv_get(void* hv, int64_t key, float* out) {
  if (key == kEmpty) return 0;
  Handle* h = reinterpret_cast<Handle*>(hv);
  uint64_t cap = h->hdr->capacity, dim = h->hdr->dim;
  uint64_t i = mix((uint64_t)key) % cap;
  for (uint64_t probe = 0; probe < cap; probe++, i = (i + 1) % cap) {
    int64_t cur = __atomic_load_n(slot_key(h, i), __ATOMIC_ACQUIRE);
    if (cur == kEmpty) return 0;
    if (cur == key) {
      uint32_t* ver = slot_ver(h, i);
      for (;;) {  // seqlock read
        uint32_t v0 = __atomic_load_n(ver, __ATOMIC_ACQUIRE);
        if (v0 & 1) continue;  // write in progress
        memcpy(out, slot_val(h, i), 4 * dim);
        uint32_t v1 = __atomic_load_n(ver, __ATOMIC_ACQUIRE);
        if (v0 == v1) return 1;
      }
    }
  }
  return 0;
}

// Batched variants (release the amortised call overhead).
int shmkv_put_batch(void* hv, const int64_t* keys, const float* vals,
                    uint64_t n) {
  Handle* h = reinterpret_cast<Handle*>(hv);
  uint64_t dim = h->hdr->dim;
  for (uint64_t j = 0; j < n; j++) {
    int rc = shmkv_put(hv, keys[j], vals + j * dim);
    if (rc != 0) return rc;
  }
  return 0;
}

// found[j] = 1/0 per key; missing rows left untouched.
void shmkv_get_batch(void* hv, const int64_t* keys, float* out,
                     uint8_t* found, uint64_t n) {
  Handle* h = reinterpret_cast<Handle*>(hv);
  uint64_t dim = h->hdr->dim;
  for (uint64_t j = 0; j < n; j++) {
    found[j] = (uint8_t)shmkv_get(hv, keys[j], out + j * dim);
  }
}

void shmkv_close(void* hv, int unlink_segment) {
  Handle* h = reinterpret_cast<Handle*>(hv);
  size_t total = sizeof(Header) + h->hdr->capacity * h->slot_bytes;
  munmap(h->hdr, total);
  close(h->fd);
  if (unlink_segment) shm_unlink(h->name);
  delete h;
}

}  // extern "C"
