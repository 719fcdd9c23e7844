// Native batch-plan service — the host half of the streaming kernel
// engines' data path, in C++ threads.
//
// Reference analogue: LightCTR plans its batches on host worker threads
// (thread_pool.h pools drive the per-batch feature dedup/sort inside
// batchGradCompute, distributed_algo_abst.h:181-190) while the math
// runs elsewhere. Our TPU build plans on-device for the fused streaming
// step (models/fm_kernel.plan_batch_on_device), but three host paths
// remain hot:
//   1. full-batch CLI startup plans (ops/embedding_pallas.plan_sorted_layout
//      — a stable argsort + dedup over B*L int64 ids),
//   2. the auto-capacity octave picker counting per-batch unique ids on
//      the Prefetcher thread (train/kernel_engine.py), and
//   3. plan-ahead for host-planned streaming (plan_batch per minibatch).
// This file provides all three natively:
//   - lc_plan_sorted: exact plan_sorted_layout core (stable sort by
//     (key, position) via composite int64 keys, chunked parallel sort +
//     k-way merge, rank assignment, compact unique-id list),
//   - lc_count_unique: open-addressing hash-set unique counter,
//   - lc_plan_server_*: a bounded thread-pool service that plans
//     submitted batches ahead of consumption (tickets + condvars), so
//     Python's Prefetcher overlaps planning with device compute without
//     holding the GIL (ctypes releases it around every call).
//
// Exactness contract: outputs are BYTE-IDENTICAL to the numpy planner
// (tests/test_plan_native.py) — the composite key (id << 20 | position)
// makes an unstable sort reproduce numpy's kind="stable" order.
// Bounds: n <= 2^20 positions per batch, ids < 2^40 (the sentinel the
// numpy planner also uses); callers fall back to numpy outside them.

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr int64_t kSentinelId = int64_t(1) << 40;  // matches numpy planner
constexpr int kPosBits = 20;
constexpr int64_t kPosMask = (int64_t(1) << kPosBits) - 1;

int hw_threads(int requested) {
  if (requested > 0) return requested;
  unsigned hc = std::thread::hardware_concurrency();
  return hc ? int(hc) : 4;
}

// Chunked parallel sort: std::sort per chunk on its own thread, then
// iterative pairwise std::inplace_merge (also parallel per level).
void parallel_sort(int64_t* keys, int64_t n, int n_threads) {
  // threads only pay for themselves above ~64k keys (spawn+merge cost
  // vs one std::sort); below that a single sort of the composite keys
  // already beats numpy's stable ARGSORT (no index indirection)
  int t = std::min<int64_t>(hw_threads(n_threads),
                            std::max<int64_t>(1, n / 65536));
  if (t <= 1) {
    std::sort(keys, keys + n);
    return;
  }
  std::vector<int64_t> bounds(t + 1);
  for (int i = 0; i <= t; ++i) bounds[i] = n * i / t;
  {
    std::vector<std::thread> pool;
    for (int i = 0; i < t; ++i)
      pool.emplace_back([&, i] { std::sort(keys + bounds[i], keys + bounds[i + 1]); });
    for (auto& th : pool) th.join();
  }
  // merge levels: [b0,b1,b2] -> [b0,b2] ...
  while (bounds.size() > 2) {
    std::vector<int64_t> next;
    next.push_back(bounds[0]);
    std::vector<std::thread> pool;
    for (size_t i = 0; i + 2 < bounds.size(); i += 2) {
      int64_t lo = bounds[i], mid = bounds[i + 1], hi = bounds[i + 2];
      pool.emplace_back([=] { std::inplace_merge(keys + lo, keys + mid, keys + hi); });
      next.push_back(hi);
    }
    if (bounds.size() % 2 == 0) next.push_back(bounds.back());  // odd chunk rides up
    for (auto& th : pool) th.join();
    bounds = std::move(next);
  }
}

int64_t plan_sorted_core(const int64_t* ids, const float* valid, int64_t n,
                         int32_t* perm, int32_t* ranks, int64_t* uids,
                         int64_t* n_unique_out, int64_t* n_valid_out,
                         int n_threads) {
  if (n <= 0 || n > (int64_t(1) << kPosBits)) return -1;
  std::vector<int64_t> keys(static_cast<size_t>(n), 0);
  int64_t n_valid = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t id = ids[i];
    bool ok = valid[i] > 0.0f;
    // masked-out ids are never inspected (numpy maps them straight to
    // the sentinel), so only masked-in ids face the domain bound
    if (ok && (id < 0 || id >= kSentinelId)) return -2;
    n_valid += ok;
    keys[size_t(i)] = ((ok ? id : kSentinelId) << kPosBits) | i;
  }
  parallel_sort(keys.data(), n, n_threads);
  int64_t rank = -1, prev = -1;
  for (int64_t i = 0; i < n; ++i) {
    int64_t id = keys[size_t(i)] >> kPosBits;
    perm[i] = int32_t(keys[size_t(i)] & kPosMask);
    if (id == kSentinelId) {
      ranks[i] = -1;  // caller maps to its pad rank
      continue;
    }
    if (id != prev) {
      ++rank;
      uids[rank] = id;
      prev = id;
    }
    ranks[i] = int32_t(rank);
  }
  *n_unique_out = rank + 1;
  *n_valid_out = n_valid;
  return 0;
}

}  // namespace

extern "C" {

// Exact plan_sorted_layout core. perm/ranks sized [n]; uids sized [n]
// (first *n_unique entries filled, ascending). ranks carry -1 at masked
// (sentinel) positions. Returns 0, or <0 if (n, ids) exceed the
// composite-key domain — caller falls back to the numpy planner.
int64_t lc_plan_sorted(const int64_t* ids, const float* valid, int64_t n,
                       int32_t* perm, int32_t* ranks, int64_t* uids,
                       int64_t* n_unique_out, int64_t* n_valid_out,
                       int n_threads) {
  return plan_sorted_core(ids, valid, n, perm, ranks, uids, n_unique_out,
                          n_valid_out, n_threads);
}

// Unique count of masked-in ids (the auto-capacity octave input,
// train/kernel_engine.py): open-addressing hash set, id+1 stored so 0
// means empty; ~O(n) vs numpy's O(n log n) sort-based unique.
int64_t lc_count_unique(const int64_t* ids, const float* valid, int64_t n) {
  uint64_t cap = 16;
  int log2_cap = 4;
  while (cap < uint64_t(n) * 2) { cap <<= 1; ++log2_cap; }
  std::vector<uint64_t> table(cap, 0);
  uint64_t mask = cap - 1;
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (valid[i] <= 0.0f) continue;
    uint64_t key = uint64_t(ids[i]) + 1;
    // high bits of the multiplicative hash: the low k bits of an
    // odd-multiplier product depend only on the low k bits of the key,
    // so `& mask` would collide every id congruent mod capacity into
    // one probe chain (O(n^2) for strided/aligned id patterns)
    uint64_t h = (key * 0x9E3779B97F4A7C15ULL) >> (64 - log2_cap);
    for (;;) {
      uint64_t cur = table[h];
      if (cur == key) break;
      if (cur == 0) {
        table[h] = key;
        ++count;
        break;
      }
      h = (h + 1) & mask;
    }
  }
  return count;
}

// Range-binned unique counter for the partitioned-master caps: one
// hash-set pass that also bins each NEW unique id into its id-range
// partition (bounds ascending, bounds[n_bounds-1] > every id). Replaces
// the per-batch numpy sort-unique + searchsorted on the Prefetcher
// thread — the host-planning cost the r5 e2e production row measured as
// its bottleneck (bench.py production_zipf_e2e_*). counts_out must hold
// n_bounds int64 slots. Returns total uniques, -1 on bad input.
extern "C" int64_t lc_count_unique_ranges(const int64_t* ids,
                                          const float* valid, int64_t n,
                                          const int64_t* bounds,
                                          int64_t n_bounds,
                                          int64_t* counts_out) {
  if (n < 0 || n_bounds <= 0) return -1;
  for (int64_t p = 0; p < n_bounds; ++p) counts_out[p] = 0;
  uint64_t cap = 16;
  int log2_cap = 4;
  while (cap < uint64_t(n) * 2) { cap <<= 1; ++log2_cap; }
  std::vector<uint64_t> table(cap, 0);
  uint64_t mask = cap - 1;
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (valid[i] <= 0.0f) continue;
    uint64_t key = uint64_t(ids[i]) + 1;
    uint64_t h = (key * 0x9E3779B97F4A7C15ULL) >> (64 - log2_cap);
    for (;;) {
      uint64_t cur = table[h];
      if (cur == key) break;
      if (cur == 0) {
        table[h] = key;
        ++count;
        int64_t id = ids[i];
        for (int64_t p = 0; p < n_bounds; ++p) {   // n_bounds <= ~8
          if (id < bounds[p]) { ++counts_out[p]; break; }
        }
        break;
      }
      h = (h + 1) & mask;
    }
  }
  return count;
}

// ---------------------------------------------------------------------------
// Plan-ahead server: worker threads plan submitted batches while the
// trainer consumes earlier ones (the reference's thread-pool data path,
// thread_pool.h:92-130, as a bounded-queue service).

struct PlanJob {
  std::vector<int64_t> ids;
  std::vector<float> valid;
  std::vector<int32_t> perm, ranks;
  std::vector<int64_t> uids;
  int64_t n = 0, n_unique = 0, n_valid = 0, status = 0;
  bool done = false;
};

struct PlanServer {
  std::mutex mu;
  std::condition_variable cv_work;   // workers wait for jobs
  std::condition_variable cv_done;   // waiters + submitters wait for slots
  std::deque<int64_t> pending;
  std::unordered_map<int64_t, PlanJob> jobs;
  std::vector<std::thread> workers;
  size_t max_outstanding;
  bool stop = false;

  PlanServer(int n_threads, int n_slots)
      : max_outstanding(size_t(std::max(1, n_slots))) {
    int t = std::max(1, hw_threads(n_threads));
    for (int i = 0; i < t; ++i)
      workers.emplace_back([this] { run(); });
  }

  void run() {
    for (;;) {
      int64_t ticket;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] { return stop || !pending.empty(); });
        if (stop && pending.empty()) return;
        ticket = pending.front();
        pending.pop_front();
      }
      PlanJob* job;
      {
        std::lock_guard<std::mutex> lk(mu);
        job = &jobs.at(ticket);
      }
      // plan outside the lock; single-threaded sort per job — the
      // parallelism is ACROSS queued batches here
      job->perm.resize(size_t(job->n));
      job->ranks.resize(size_t(job->n));
      job->uids.resize(size_t(job->n));
      job->status = plan_sorted_core(
          job->ids.data(), job->valid.data(), job->n, job->perm.data(),
          job->ranks.data(), job->uids.data(), &job->n_unique,
          &job->n_valid, /*n_threads=*/1);
      {
        std::lock_guard<std::mutex> lk(mu);
        job->done = true;
      }
      cv_done.notify_all();
    }
  }
};

void* lc_plan_server_create(int n_threads, int n_slots) {
  return new PlanServer(n_threads, n_slots);
}

// Copies the batch and queues it; blocks while max_outstanding jobs are
// already queued/unclaimed (bounded memory). Returns 0, -1 on dup ticket.
int lc_plan_server_submit(void* srv_, int64_t ticket, const int64_t* ids,
                          const float* valid, int64_t n) {
  auto* srv = static_cast<PlanServer*>(srv_);
  std::unique_lock<std::mutex> lk(srv->mu);
  srv->cv_done.wait(lk, [&] {
    return srv->stop || srv->jobs.size() < srv->max_outstanding;
  });
  if (srv->stop) return -2;
  if (srv->jobs.count(ticket)) return -1;
  PlanJob& job = srv->jobs[ticket];
  job.n = n;
  job.ids.assign(ids, ids + n);
  job.valid.assign(valid, valid + n);
  srv->pending.push_back(ticket);
  lk.unlock();
  srv->cv_work.notify_one();
  return 0;
}

// Blocks until the ticket's plan is ready, copies it out, frees the slot.
// Returns the planner status (0 ok), -3 for an unknown ticket.
int64_t lc_plan_server_wait(void* srv_, int64_t ticket, int32_t* perm,
                            int32_t* ranks, int64_t* uids,
                            int64_t* n_unique_out, int64_t* n_valid_out) {
  auto* srv = static_cast<PlanServer*>(srv_);
  std::unique_lock<std::mutex> lk(srv->mu);
  auto it = srv->jobs.find(ticket);
  if (it == srv->jobs.end()) return -3;
  srv->cv_done.wait(lk, [&] { return it->second.done; });
  PlanJob job = std::move(it->second);
  srv->jobs.erase(it);
  lk.unlock();
  srv->cv_done.notify_all();  // a submitter may be waiting on the slot
  if (job.status == 0) {
    std::memcpy(perm, job.perm.data(), size_t(job.n) * sizeof(int32_t));
    std::memcpy(ranks, job.ranks.data(), size_t(job.n) * sizeof(int32_t));
    std::memcpy(uids, job.uids.data(), size_t(job.n_unique) * sizeof(int64_t));
    *n_unique_out = job.n_unique;
    *n_valid_out = job.n_valid;
  }
  return job.status;
}

void lc_plan_server_destroy(void* srv_) {
  auto* srv = static_cast<PlanServer*>(srv_);
  {
    std::lock_guard<std::mutex> lk(srv->mu);
    srv->stop = true;
  }
  srv->cv_work.notify_all();
  srv->cv_done.notify_all();
  for (auto& th : srv->workers) th.join();
  delete srv;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// GBM gradient/hessian histogram (the grower's per-level hot loop,
// models/gbm.py _histogram): hist[comp[r], f, bins[r, f]] += (g[r], h[r])
// for rows with comp[r] >= 0. Feature-parallel across threads (each
// thread owns a contiguous feature range, so all writes are disjoint —
// no atomics). The XLA scatter-add stays the reference implementation
// and the fallback (tests pin equality).

extern "C" int64_t lc_gbm_hist(const uint8_t* bins, const float* g,
                               const float* h, const int32_t* comp,
                               int64_t n_rows, int64_t n_feats,
                               int64_t n_bins, int64_t n_slots,
                               float* out /* [n_slots, F, n_bins, 2] */,
                               int n_threads) {
  // zero the output (caller may pass uninitialised memory)
  std::memset(out, 0, size_t(n_slots * n_feats * n_bins * 2) * sizeof(float));
  // precompute the selected rows once (shared, read-only)
  std::vector<int32_t> rows;
  rows.reserve(size_t(n_rows));
  for (int64_t r = 0; r < n_rows; ++r) {
    if (comp[r] >= 0) {
      if (comp[r] >= n_slots) return -1;
      rows.push_back(int32_t(r));
    }
  }
  int t = std::min<int64_t>(hw_threads(n_threads),
                            std::max<int64_t>(1, n_feats / 16));
  auto work = [&](int64_t f0, int64_t f1) {
    for (int32_t r : rows) {
      const uint8_t* brow = bins + int64_t(r) * n_feats;
      const float gr = g[r], hr = h[r];
      float* slot = out + (int64_t(comp[r]) * n_feats) * n_bins * 2;
      for (int64_t f = f0; f < f1; ++f) {
        float* cell = slot + (f * n_bins + brow[f]) * 2;
        cell[0] += gr;
        cell[1] += hr;
      }
    }
  };
  if (t <= 1) {
    work(0, n_feats);
  } else {
    std::vector<std::thread> pool;
    for (int i = 0; i < t; ++i) {
      int64_t f0 = n_feats * i / t, f1 = n_feats * (i + 1) / t;
      pool.emplace_back(work, f0, f1);
    }
    for (auto& th : pool) th.join();
  }
  return 0;
}
