// Golden-value capture for reference WeightMinHash dense-update parity
// (lsh-cpp weight_minhash.h:78-106, WeightMinHash<dim,...>::update).
//
// Realizes the reference's float32 update chain with the SYSTEM toolchain
// (g++ 12 / libstdc++ 12 / glibc logf) — scalar loops over exactly the
// element-wise formulas the reference evaluates through Eigen ArrayXf:
//   * sample matrices r_k / ln_c_k / beta_k filled by the same
//     interleaved draw chain as RandomSample (weight_minhash.h:22-33):
//     one mt19937_64, one gamma_distribution<float>(2,1), one
//     uniform_real_distribution<float>(0,1), column-major;
//   * all-zero weight vector -> update fails (returns false; emitted as
//     null here), weight_minhash.h:80-83;
//   * zero weights -> numeric_limits<float>::min() substitution, kept in
//     the argmin (weight_minhash.h:85-95);
//   * per sample column i (float32 throughout):
//       t    = floor(log(w) / r_k + beta_k)
//       ln_y = (t - beta_k) * r_k
//       ln_a = ln_c_k - ln_y - r_k
//       k*   = first index of min ln_a;  emit (k*, (int)t[k*])
//
// This file contains no reference code: it exercises only <random>/<cmath>
// with the parameters and formulas the reference declares.  One caveat,
// documented in lshdedup/wminhash.py: a reference binary built with Eigen
// SIMD packet-math log() could differ from glibc logf by ulps; this golden
// pins the scalar-libm realization.
//
// Build+run (keep default -O2; baseline x86-64 has no FMA so float ops
// are strict IEEE single-precision SSE, and -O2 alone never vectorizes
// libm calls into libmvec):
//   g++ -O2 -std=c++17 -o /tmp/capture_wmh tools/capture_ref_wmh.cpp
//   /tmp/capture_wmh > tests/fixtures/ref_wmh_golden.json
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <limits>
#include <random>
#include <vector>

constexpr int DIM = 64;
constexpr int S = 16;

int main() {
    // RandomSample fill chain (weight_minhash.h:22-33)
    std::mt19937_64 gen(1);
    std::gamma_distribution<float> gamma_dis(2, 1);
    std::uniform_real_distribution<float> uniform_dis(0, 1);
    static float r[DIM][S], ln_c[DIM][S], beta[DIM][S];
    for (int n_sample = 0; n_sample < S; n_sample++)
        for (int i = 0; i < DIM; i++) {
            r[i][n_sample] = gamma_dis(gen);
            ln_c[i][n_sample] = std::log(gamma_dis(gen));
            beta[i][n_sample] = uniform_dis(gen);
        }

    // deterministic weight cases (exactly representable in float32 so the
    // Python side can rebuild them bit-identically)
    const int n_cases = 6;
    const char* names[n_cases] = {"mod11", "ones", "mod5_zeroed",
                                  "all_zero", "halves", "pow2_range"};
    std::vector<std::vector<float>> cases(n_cases, std::vector<float>(DIM));
    for (int i = 0; i < DIM; i++) {
        cases[0][i] = (float)((i * 7 + 3) % 11);
        cases[1][i] = 1.0f;
        cases[2][i] = (i % 5 == 0) ? 0.0f : (float)i;
        cases[3][i] = 0.0f;
        cases[4][i] = (float)(i % 7) * 0.5f;
        cases[5][i] = std::ldexp(1.0f, (i % 40) - 20);
    }

    std::printf("{\n  \"seed\": 1,\n  \"dim\": %d,\n  \"sample_size\": %d,\n",
                DIM, S);
    std::printf("  \"cases\": [");
    for (int c = 0; c < n_cases; c++) {
        bool all_zero = true;
        for (int i = 0; i < DIM; i++)
            if (cases[c][i] != 0.0f) { all_zero = false; break; }
        std::printf("%s\n    {\"name\": \"%s\", ", c ? "," : "", names[c]);
        if (all_zero) {  // update returns false (weight_minhash.h:80-83)
            std::printf("\"sig\": null}");
            continue;
        }
        float w[DIM];
        for (int i = 0; i < DIM; i++)
            w[i] = (cases[c][i] == 0.0f)
                       ? std::numeric_limits<float>::min()
                       : cases[c][i];
        std::printf("\"sig_k\": [");
        long ks[S];
        long ts[S];
        for (int s = 0; s < S; s++) {
            float best_a = 0.0f;
            long best_k = -1;
            float best_t = 0.0f;
            for (int i = 0; i < DIM; i++) {
                float t = std::floor(std::log(w[i]) / r[i][s] + beta[i][s]);
                float ln_y = (t - beta[i][s]) * r[i][s];
                float ln_a = ln_c[i][s] - ln_y - r[i][s];
                if (best_k < 0 || ln_a < best_a) {
                    best_a = ln_a;
                    best_k = i;
                    best_t = t;
                }
            }
            ks[s] = best_k;
            ts[s] = (long)(int_fast32_t)best_t;
        }
        for (int s = 0; s < S; s++) std::printf("%s%ld", s ? ", " : "", ks[s]);
        std::printf("], \"sig_t\": [");
        for (int s = 0; s < S; s++) std::printf("%s%ld", s ? ", " : "", ts[s]);
        std::printf("]}");
    }
    std::printf("\n  ]\n}\n");
    return 0;
}
