// Golden-value capture for reference WMH sample-matrix parity
// (lsh-cpp weight_minhash.h:12-35, RandomSample<dim, sample_size, seed>).
//
// Reproduces the exact draw chain the reference uses to fill its
// r_k / ln_c_k / beta_k matrices with the SYSTEM toolchain (g++ 12 /
// libstdc++ 12):
//   * std::mt19937_64 generator(seed)
//   * std::gamma_distribution<float>(2, 1)  (Marsaglia-Tsang, alpha>=1
//     branch, with the cached Marsaglia-polar normal_distribution<float>)
//   * std::uniform_real_distribution<float>(0, 1)
//   * column-major fill: for each sample column, for each dim row:
//     r = gamma(); ln_c = log(gamma()); beta = uniform()
//     (ONE gamma_dis object serves both r and ln_c, so its internal
//     normal cache is shared across the two draws)
//
// This file contains no reference code: it exercises only <random> with
// the parameters the reference declares.  Floats are dumped as exact
// uint32 bit patterns (plus %a hex for readability).  Output: JSON on
// stdout, committed as tests/fixtures/ref_gamma_golden.json and pinned by
// tests/test_refparity.py.
//
// Build+run (keep default -O2; baseline x86-64 has no FMA so float ops
// are strict IEEE single-precision SSE):
//   g++ -O2 -std=c++17 -o /tmp/capture_gamma tools/capture_ref_gamma.cpp
//   /tmp/capture_gamma > tests/fixtures/ref_gamma_golden.json
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>

static uint32_t bits(float f) {
    uint32_t u;
    std::memcpy(&u, &f, sizeof u);
    return u;
}

int main() {
    constexpr int n_single = 64;  // standalone per-distribution sequences
    constexpr int dim = 4;        // small RandomSample config
    constexpr int sample_size = 8;

    std::printf("{\n  \"seed\": 1,\n");

    // standalone gamma(2,1) sequence (fresh generator)
    {
        std::mt19937_64 gen(1);
        std::gamma_distribution<float> g(2, 1);
        std::printf("  \"gamma_bits\": [");
        for (int i = 0; i < n_single; i++)
            std::printf("%s%u", i ? ", " : "", bits(g(gen)));
        std::printf("],\n");
    }
    // standalone normal(0,1) sequence (fresh generator)
    {
        std::mt19937_64 gen(1);
        std::normal_distribution<float> n(0, 1);
        std::printf("  \"normal_bits\": [");
        for (int i = 0; i < n_single; i++)
            std::printf("%s%u", i ? ", " : "", bits(n(gen)));
        std::printf("],\n");
    }
    // standalone uniform_real(0,1) sequence (fresh generator)
    {
        std::mt19937_64 gen(1);
        std::uniform_real_distribution<float> u(0, 1);
        std::printf("  \"uniform_bits\": [");
        for (int i = 0; i < n_single; i++)
            std::printf("%s%u", i ? ", " : "", bits(u(gen)));
        std::printf("],\n");
    }
    // the RandomSample fill chain itself (weight_minhash.h:22-33):
    // one generator, one gamma_dis, one uniform_dis, column-major
    {
        std::mt19937_64 gen(1);
        std::gamma_distribution<float> gamma_dis(2, 1);
        std::uniform_real_distribution<float> uniform_dis(0, 1);
        float r[dim][sample_size], ln_c[dim][sample_size], beta[dim][sample_size];
        for (int n_sample = 0; n_sample < sample_size; n_sample++)
            for (int i = 0; i < dim; i++) {
                r[i][n_sample] = gamma_dis(gen);
                ln_c[i][n_sample] = std::log(gamma_dis(gen));
                beta[i][n_sample] = uniform_dis(gen);
            }
        std::printf("  \"dim\": %d,\n  \"sample_size\": %d,\n", dim, sample_size);
        const char* names[3] = {"r_bits", "ln_c_bits", "beta_bits"};
        float (*mats[3])[sample_size] = {r, ln_c, beta};
        for (int m = 0; m < 3; m++) {
            std::printf("  \"%s\": [", names[m]);
            for (int i = 0; i < dim; i++)
                for (int j = 0; j < sample_size; j++)
                    std::printf("%s%u", (i || j) ? ", " : "", bits(mats[m][i][j]));
            std::printf("]%s\n", m < 2 ? "," : "");
        }
    }
    std::printf("}\n");
    return 0;
}
