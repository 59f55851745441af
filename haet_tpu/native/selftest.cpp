// Sanitizer self-test for the native ball tree: builds batched trees and
// partition trees over random data with OpenMP parallelism, checks the
// permutation invariants. Run under -fsanitize=address / thread via the
// Makefile (`make asan`, `make tsan`).

#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

#include "balltree.cpp"

int main() {
    std::mt19937 rng(42);
    std::uniform_real_distribution<double> U(0.0, 1.0);

    const int64_t dim = 3;
    const int64_t num_batches = 64;   // enough to exercise OpenMP
    std::vector<int64_t> offsets(num_batches + 1, 0);
    std::vector<int64_t> sizes;
    for (int64_t b = 0; b < num_batches; ++b) {
        int64_t n = 3 + (rng() % 250);
        sizes.push_back(n);
        offsets[b + 1] = offsets[b] + n;
    }
    const int64_t total = offsets[num_batches];
    std::vector<double> pts(total * dim);
    for (auto& v : pts) v = U(rng);

    std::vector<int64_t> out_offsets(num_batches + 1, 0);
    for (int64_t b = 0; b < num_batches; ++b)
        out_offsets[b + 1] = out_offsets[b] + haet_tree_slots(sizes[b]);
    const int64_t slots = out_offsets[num_batches];
    std::vector<int64_t> out_idx(slots, -1);
    std::vector<uint8_t> out_mask(slots, 2);

    int64_t rc = haet_build_balltree(pts.data(), dim, offsets.data(),
                                     out_offsets.data(), num_batches,
                                     out_idx.data(), out_mask.data());
    if (rc != 0) { std::printf("build rc=%lld\n", (long long)rc); return 1; }

    // every real point appears exactly once among masked slots, in-batch
    for (int64_t b = 0; b < num_batches; ++b) {
        std::vector<int> seen(sizes[b], 0);
        for (int64_t s = out_offsets[b]; s < out_offsets[b + 1]; ++s) {
            int64_t idx = out_idx[s];
            if (idx < offsets[b] || idx >= offsets[b + 1]) {
                std::printf("batch %lld: idx out of range\n", (long long)b);
                return 1;
            }
            if (out_mask[s]) seen[idx - offsets[b]] += 1;
        }
        for (int64_t i = 0; i < sizes[b]; ++i)
            if (seen[i] != 1) {
                std::printf("batch %lld: point %lld seen %d times\n",
                            (long long)b, (long long)i, seen[i]);
                return 1;
            }
    }

    // partition-only pass over the same data
    std::vector<int64_t> part_idx(total, -1);
    rc = haet_partition_balltree(pts.data(), dim, offsets.data(), num_batches,
                                 3, part_idx.data());
    if (rc != 0) { std::printf("partition rc=%lld\n", (long long)rc); return 1; }
    for (int64_t b = 0; b < num_batches; ++b) {
        std::vector<int> seen(sizes[b], 0);
        for (int64_t s = offsets[b]; s < offsets[b + 1]; ++s)
            seen[part_idx[s] - offsets[b]] += 1;
        for (int64_t i = 0; i < sizes[b]; ++i)
            if (seen[i] != 1) { std::printf("partition perm broken\n"); return 1; }
    }

    std::printf("selftest OK (%lld points, %lld batches, %lld threads)\n",
                (long long)total, (long long)num_batches,
                (long long)haet_num_threads());
    return 0;
}
