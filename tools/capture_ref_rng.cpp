// Golden-value capture for reference RNG parity (lsh-cpp minhash.h:25-67).
//
// Reproduces RandomHashPermutation<Seed=1, std::mt19937_64, n_permutation>
// with the SYSTEM toolchain (g++ 12 / libstdc++ 12, which implements
// Lemire's nearly-divisionless downscale for 64-bit generators) and dumps:
//   * the first raw mt19937_64 outputs for seed 1 (generator parity), and
//   * the interleaved dis_a(1, p-1) / dis_b(0, p-1) draws, p = 2^61-1
//     (distribution parity — the (a,b) table the reference signs with).
//
// This file contains no reference code: it exercises only <random> with the
// parameters the reference declares.  Output: JSON on stdout, committed as
// tests/fixtures/ref_rng_golden.json and pinned by tests/test_refparity.py.
//
// Build+run: g++ -O2 -std=c++17 -o /tmp/capture tools/capture_ref_rng.cpp
//            /tmp/capture > tests/fixtures/ref_rng_golden.json
#include <cstdint>
#include <cstdio>
#include <random>

int main() {
    constexpr uint64_t p = (1ull << 61u) - 1u;   // mersenne_prime (hash.h:25-27)
    constexpr int n_perm = 128;                  // minhash.h:85 default
    constexpr int n_raw = 64;

    std::printf("{\n  \"seed\": 1,\n  \"mersenne_prime\": %llu,\n",
                (unsigned long long)p);

    std::mt19937_64 raw(1);
    std::printf("  \"mt19937_64_raw\": [");
    for (int i = 0; i < n_raw; i++)
        std::printf("%s%llu", i ? ", " : "", (unsigned long long)raw());
    std::printf("],\n");

    // RandomHashPermutation body (minhash.h:58-66): ONE generator, a then b
    // drawn alternately per permutation index.
    std::mt19937_64 gen(1);
    std::uniform_int_distribution<uint64_t> dis_a(1, p - 1);
    std::uniform_int_distribution<uint64_t> dis_b(0, p - 1);
    uint64_t a[n_perm], b[n_perm];
    for (int i = 0; i < n_perm; i++) { a[i] = dis_a(gen); b[i] = dis_b(gen); }

    std::printf("  \"vector_a\": [");
    for (int i = 0; i < n_perm; i++)
        std::printf("%s%llu", i ? ", " : "", (unsigned long long)a[i]);
    std::printf("],\n  \"vector_b\": [");
    for (int i = 0; i < n_perm; i++)
        std::printf("%s%llu", i ? ", " : "", (unsigned long long)b[i]);
    std::printf("]\n}\n");
    return 0;
}
