// Vertex weld: sorted-unique with first-occurrence indices and inverse map.
//
// Replaces the numpy `np.unique(keys, return_index=True,
// return_inverse=True)` call in isosurface extraction
// (hive_tpu/ops/marching.py) — the per-extraction host weld over millions of
// 64-bit grid-edge keys. An LSD radix sort (8-bit digits, passes skipped
// when a digit is constant — keys are < dims^2 so the high bytes usually
// are) runs several times faster than numpy's argsort-based unique on this
// single-core host.
//
// Semantics match np.unique exactly: unique values ascending;
// first_index[r] = the SMALLEST original index holding the r-th unique
// value (LSD radix is stable, so the first element of each equal run keeps
// the lowest original index); inverse[i] = rank of keys[i].

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>

extern "C" {

// Returns the number of unique keys (<= n), or -1 on allocation failure.
// first_index and inverse must hold n elements each.
int64_t hive_weld_unique(const uint64_t* keys, int64_t n,
                         int64_t* first_index, int64_t* inverse) {
    if (n <= 0) {
        return 0;
    }

    // std::bad_alloc must not cross the extern "C" boundary (it would
    // abort the process); report -1 so the Python wrapper can fall back
    // to np.unique.
    std::vector<int64_t> order;
    std::vector<int64_t> scratch;
    try {
        order.resize(n);
        scratch.resize(n);
    } catch (...) {
        return -1;
    }
    for (int64_t i = 0; i < n; ++i) {
        order[i] = i;
    }

    int64_t counts[256];

    for (int pass = 0; pass < 8; ++pass) {
        const int shift = pass * 8;

        std::memset(counts, 0, sizeof(counts));
        for (int64_t i = 0; i < n; ++i) {
            ++counts[(keys[order[i]] >> shift) & 0xFF];
        }

        // All keys share this digit: nothing to reorder.
        bool constant = false;
        for (int d = 0; d < 256; ++d) {
            if (counts[d] == n) {
                constant = true;
                break;
            }
        }
        if (constant) {
            continue;
        }

        int64_t offsets[256];
        int64_t total = 0;
        for (int d = 0; d < 256; ++d) {
            offsets[d] = total;
            total += counts[d];
        }

        for (int64_t i = 0; i < n; ++i) {
            const int64_t src = order[i];
            scratch[offsets[(keys[src] >> shift) & 0xFF]++] = src;
        }
        order.swap(scratch);
    }

    int64_t unique_count = 0;
    uint64_t prev = ~keys[order[0]];  // differs from the first key

    for (int64_t i = 0; i < n; ++i) {
        const int64_t src = order[i];
        const uint64_t key = keys[src];
        if (key != prev) {
            first_index[unique_count] = src;
            prev = key;
            ++unique_count;
        }
        inverse[src] = unique_count - 1;
    }

    return unique_count;
}

// Per-welded-vertex average of oct-encoded (snorm16x2) normals, one pass.
//
// Replaces the numpy pipeline in hive_tpu/ops/marching.py
// (_decode_oct_average): decode u16x2 -> octahedral fold -> three
// bincount accumulations -> normalize. numpy makes ~10 full passes over
// the emitted-vertex arrays (millions of elements); this fuses decode +
// accumulate into one pass and normalizes over the (much smaller) unique
// set. No allocations, so no failure mode.
//
// packed:  n oct-encoded normals (low 16 bits = x, high = y, each
//          snorm-mapped to [0, 65535]).
// inverse: n welded ranks in [0, num_unique) (from hive_weld_unique).
// out:     num_unique * 3 floats (caller-allocated, overwritten).
void hive_oct_average(const uint32_t* packed, const int64_t* inverse,
                      int64_t n, int64_t num_unique, float* out) {
    std::memset(out, 0, sizeof(float) * 3 * num_unique);

    constexpr float kScale = 2.0f / 65535.0f;

    for (int64_t i = 0; i < n; ++i) {
        const uint32_t p = packed[i];
        const float ux = static_cast<float>(p & 0xFFFF) * kScale - 1.0f;
        const float uy = static_cast<float>(p >> 16) * kScale - 1.0f;

        const float ax = ux < 0.0f ? -ux : ux;
        const float ay = uy < 0.0f ? -uy : uy;
        const float nz = 1.0f - ax - ay;

        float nx = ux;
        float ny = uy;
        if (nz < 0.0f) {  // fold the lower hemisphere back out
            nx = (1.0f - ay) * (ux >= 0.0f ? 1.0f : -1.0f);
            ny = (1.0f - ax) * (uy >= 0.0f ? 1.0f : -1.0f);
        }

        float* acc = out + 3 * inverse[i];
        acc[0] += nx;
        acc[1] += ny;
        acc[2] += nz;
    }

    for (int64_t r = 0; r < num_unique; ++r) {
        float* acc = out + 3 * r;
        const float len2 = acc[0] * acc[0] + acc[1] * acc[1] + acc[2] * acc[2];
        if (len2 > 1e-24f) {
            const float inv = 1.0f / std::sqrt(len2);
            acc[0] *= inv;
            acc[1] *= inv;
            acc[2] *= inv;
        }
    }
}

}  // extern "C"
