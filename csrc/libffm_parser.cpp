// Native libffm parser — the runtime data-ingestion path.
//
// The reference's loaders are C++ (fm_algo_abst.h:70-107 loadDataRow with
// sscanf per token); this is the TPU build's equivalent, redesigned for
// throughput: mmap the file, split it into byte ranges on newline
// boundaries, and parse ranges in parallel threads with a branch-light
// integer/float scanner. Python binds via ctypes (bindings in
// lightctr_tpu/data/native.py); output is written straight into
// caller-allocated padded [N, L] arrays (ids/vals/fields/mask) so no copy
// happens on the Python side.
//
// Build: see csrc/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <vector>
#include <thread>
#include <atomic>
#include <algorithm>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Row {
    float label;
    uint32_t off;    // offset into the per-chunk triple pool
    uint32_t cnt;
};

struct Chunk {
    std::vector<Row> rows;
    std::vector<int32_t> fields;
    std::vector<int32_t> ids;
    std::vector<float> vals;
    int64_t max_id = -1;
    int64_t max_field = -1;
    uint32_t max_nnz = 0;
};

inline const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

inline const char* parse_int(const char* p, const char* end, int64_t* out) {
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
    int64_t v = 0;
    while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); ++p; }
    *out = neg ? -v : v;
    return p;
}

inline const char* parse_float(const char* p, const char* end, float* out) {
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
    double v = 0.0;
    while (p < end && *p >= '0' && *p <= '9') { v = v * 10.0 + (*p - '0'); ++p; }
    if (p < end && *p == '.') {
        ++p;
        double scale = 0.1;
        while (p < end && *p >= '0' && *p <= '9') { v += (*p - '0') * scale; scale *= 0.1; ++p; }
    }
    if (p < end && (*p == 'e' || *p == 'E')) {
        ++p;
        int64_t e = 0;
        p = parse_int(p, end, &e);
        v *= std::pow(10.0, (double)e);
    }
    *out = (float)(neg ? -v : v);
    return p;
}

void parse_range(const char* base, size_t lo, size_t hi, Chunk* out) {
    const char* p = base + lo;
    const char* end = base + hi;
    while (p < end) {
        // label
        p = skip_ws(p, end);
        if (p >= end || *p == '\n') { if (p < end) ++p; continue; }
        float label;
        p = parse_float(p, end, &label);
        uint32_t start = (uint32_t)out->ids.size();
        // triples field:id:val separated by spaces until newline
        while (p < end && *p != '\n') {
            p = skip_ws(p, end);
            if (p >= end || *p == '\n') break;
            int64_t field = 0, id = 0;
            float val = 0.f;
            p = parse_int(p, end, &field);
            if (p < end && *p == ':') ++p;
            p = parse_int(p, end, &id);
            if (p < end && *p == ':') ++p;
            p = parse_float(p, end, &val);
            out->fields.push_back((int32_t)field);
            out->ids.push_back((int32_t)id);
            out->vals.push_back(val);
            if (field > out->max_field) out->max_field = field;
            if (id > out->max_id) out->max_id = id;
        }
        if (p < end) ++p;  // consume newline
        uint32_t cnt = (uint32_t)out->ids.size() - start;
        if (cnt > out->max_nnz) out->max_nnz = cnt;
        out->rows.push_back({label, start, cnt});
    }
}

}  // namespace

extern "C" {

// Pass 1: parse the whole file into thread-local pools and report sizes.
// Returns an opaque handle; call ffm_fill + ffm_free afterwards.
typedef struct {
    std::vector<Chunk>* chunks;
    int64_t n_rows;
    int64_t max_id;
    int64_t max_field;
    int64_t max_nnz;
    char* data;
    size_t size;
} FfmHandle;

void* ffm_parse(const char* path, int n_threads) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
    size_t size = (size_t)st.st_size;
    char* data = (char*)mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (data == MAP_FAILED) return nullptr;

    if (n_threads <= 0) {
        n_threads = (int)std::thread::hardware_concurrency();
        if (n_threads <= 0) n_threads = 4;
    }
    if ((size_t)n_threads > size / (1 << 16) + 1)
        n_threads = (int)(size / (1 << 16) + 1);

    // split on newline boundaries
    std::vector<size_t> bounds(n_threads + 1);
    bounds[0] = 0;
    bounds[n_threads] = size;
    for (int i = 1; i < n_threads; ++i) {
        size_t guess = size * (size_t)i / n_threads;
        while (guess < size && data[guess] != '\n') ++guess;
        bounds[i] = guess < size ? guess + 1 : size;
    }

    auto* chunks = new std::vector<Chunk>(n_threads);
    std::vector<std::thread> threads;
    for (int i = 0; i < n_threads; ++i) {
        threads.emplace_back(parse_range, data, bounds[i], bounds[i + 1],
                             &(*chunks)[i]);
    }
    for (auto& t : threads) t.join();

    auto* h = new FfmHandle();
    h->chunks = chunks;
    h->data = data;
    h->size = size;
    h->n_rows = 0;
    h->max_id = -1;
    h->max_field = -1;
    h->max_nnz = 0;
    for (auto& c : *chunks) {
        h->n_rows += (int64_t)c.rows.size();
        h->max_id = std::max(h->max_id, c.max_id);
        h->max_field = std::max(h->max_field, c.max_field);
        h->max_nnz = std::max(h->max_nnz, (int64_t)c.max_nnz);
    }
    return h;
}

int64_t ffm_n_rows(void* handle) { return ((FfmHandle*)handle)->n_rows; }
int64_t ffm_max_id(void* handle) { return ((FfmHandle*)handle)->max_id; }
int64_t ffm_max_field(void* handle) { return ((FfmHandle*)handle)->max_field; }
int64_t ffm_max_nnz(void* handle) { return ((FfmHandle*)handle)->max_nnz; }

// Pass 2: fill caller-allocated padded arrays.
//   ids/fields: int32 [n_rows, pad_len]; vals/mask: float32 [n_rows, pad_len]
//   labels: float32 [n_rows]; nnz: int32 [n_rows]
void ffm_fill(void* handle, int64_t pad_len, int32_t* ids, float* vals,
              int32_t* fields, float* mask, float* labels, int32_t* nnz) {
    auto* h = (FfmHandle*)handle;
    int64_t r = 0;
    for (auto& c : *h->chunks) {
        for (auto& row : c.rows) {
            labels[r] = row.label;
            int64_t cnt = std::min<int64_t>(row.cnt, pad_len);
            nnz[r] = (int32_t)cnt;
            int64_t base = r * pad_len;
            memcpy(ids + base, c.ids.data() + row.off, cnt * sizeof(int32_t));
            memcpy(fields + base, c.fields.data() + row.off, cnt * sizeof(int32_t));
            memcpy(vals + base, c.vals.data() + row.off, cnt * sizeof(float));
            for (int64_t j = 0; j < cnt; ++j) mask[base + j] = 1.0f;
            // padding stays zero (caller zero-initialises)
            ++r;
        }
    }
}

void ffm_free(void* handle) {
    auto* h = (FfmHandle*)handle;
    munmap(h->data, h->size);
    delete h->chunks;
    delete h;
}

}  // extern "C"
