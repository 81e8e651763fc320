// Native ETL hot loops for deep_recommenders_tpu.
//
// The ingest path is host-side by design (the TPU only sees encoded ID
// tensors), which makes the host the bottleneck for real-corpus ETL: the
// reference's Python line loop over ratings.dat (ref
// deep_recommenders/datasets/movielens.py:78-93) takes tens of seconds on
// ml-1m. These C++ kernels provide:
//   - parse_ml1m_ratings: "uid::mid::rating::ts" line parser -> int64 cols
//   - crc32_bucket: batched CRC32 % buckets over a packed string buffer
//   - pack_bags: padded (N, L) multi-hot bag packing from CSR-style input
// Exposed via ctypes (no pybind11 in this image); see native/__init__.py.
//
// Build: g++ -O3 -shared -fPIC fastetl.cpp -o libfastetl.so -lz

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <zlib.h>

extern "C" {

// Parse up to max_rows lines of "a::b::c::d" integers from path.
// Returns the number of rows parsed, or -1 on open failure.
int64_t parse_ml1m_ratings(const char* path, int64_t* uid, int64_t* mid,
                           int64_t* rating, int64_t* ts, int64_t max_rows) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    char line[256];
    int64_t n = 0;
    while (n < max_rows && fgets(line, sizeof(line), f)) {
        char* p = line;
        int64_t vals[4] = {0, 0, 0, 0};
        int field = 0;
        while (*p && field < 4) {
            // Parse an integer.
            int64_t v = 0;
            bool neg = false;
            if (*p == '-') { neg = true; ++p; }
            while (*p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); ++p; }
            vals[field++] = neg ? -v : v;
            // Skip the "::" separator (or anything up to next digit/EOL).
            while (*p && (*p < '0' || *p > '9') && *p != '\n') ++p;
            if (*p == '\n') break;
        }
        if (field == 4) {
            uid[n] = vals[0];
            mid[n] = vals[1];
            rating[n] = vals[2];
            ts[n] = vals[3];
            ++n;
        }
    }
    fclose(f);
    return n;
}

// CRC32 % buckets over n strings packed in `buf` with byte offsets
// `offsets` (length n+1). Matches Python zlib.crc32(bytes) % buckets.
void crc32_bucket(const char* buf, const int64_t* offsets, int64_t n,
                  int64_t buckets, int32_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const unsigned char* start =
            reinterpret_cast<const unsigned char*>(buf + offsets[i]);
        uInt len = static_cast<uInt>(offsets[i + 1] - offsets[i]);
        uint32_t h = crc32(0L, start, len);
        out[i] = static_cast<int32_t>(h % static_cast<uint32_t>(buckets));
    }
}

// Pack CSR-style bags (flat values + row offsets, length n_rows+1) into a
// padded (n_rows, max_len) id matrix + float weights (1.0 for real slots).
void pack_bags(const int32_t* flat, const int64_t* offsets, int64_t n_rows,
               int64_t max_len, int32_t* ids_out, float* wt_out) {
    for (int64_t r = 0; r < n_rows; ++r) {
        int64_t lo = offsets[r], hi = offsets[r + 1];
        int64_t len = hi - lo;
        if (len > max_len) len = max_len;
        int64_t base = r * max_len;
        for (int64_t j = 0; j < len; ++j) {
            ids_out[base + j] = flat[lo + j];
            wt_out[base + j] = 1.0f;
        }
        for (int64_t j = len; j < max_len; ++j) {
            ids_out[base + j] = 0;
            wt_out[base + j] = 0.0f;
        }
    }
}

}  // extern "C"
