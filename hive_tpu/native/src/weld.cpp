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

}  // extern "C"
