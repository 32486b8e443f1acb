// Native chain DP: minimap2-style anchor chaining with fixed lookback.
//
// Chaining is a sequential, irregular recurrence (f[i] depends on the previous
// lookback window) — a poor fit for wide SIMD/accelerator execution but ideal
// for a tight scalar loop. This is the host-native runtime component backing
// pav_tpu.ops.chain_scan (the JAX scan remains as a fallback and as the
// device-resident variant for fused pipelines).
//
// Build: g++ -O3 -march=native -shared -fPIC chain.cpp -o libpavchain.so

#include <cstdint>
#include <cmath>
#include <algorithm>

extern "C" {

void chain_dp(const int32_t* qpos, const int32_t* rpos, const int32_t* group,
              int64_t n, int32_t k, int32_t lookback,
              float max_dist, float max_gap_diff, float gap_scale,
              float* f_out, int64_t* parent_out) {
    const float kf = static_cast<float>(k);
    for (int64_t i = 0; i < n; ++i) {
        float best = kf;
        int64_t parent = -1;
        const int64_t j0 = i > lookback ? i - lookback : 0;
        const int32_t qi = qpos[i];
        const int32_t ri = rpos[i];
        const int32_t gi = group[i];
        for (int64_t j = j0; j < i; ++j) {
            if (group[j] != gi) continue;
            const int32_t dq = qi - qpos[j];
            const int32_t dr = ri - rpos[j];
            if (dq <= 0 || dr <= 0) continue;
            if (dq > max_dist || dr > max_dist) continue;
            const int32_t dd = dq > dr ? dq - dr : dr - dq;
            if (dd > max_gap_diff) continue;
            const float match = static_cast<float>(std::min(std::min(dq, dr), k));
            const float gap_cost = dd == 0
                ? 0.0f
                : gap_scale * static_cast<float>(dd)
                  + 0.5f * std::log2(static_cast<float>(dd) + 1.0f);
            const float cand = f_out[j] + match - gap_cost;
            if (cand > best) {
                best = cand;
                parent = j;
            }
        }
        // Extending must beat starting fresh (parity with the scan kernel).
        if (best > kf) {
            f_out[i] = best;
            parent_out[i] = parent;
        } else {
            f_out[i] = kf;
            parent_out[i] = -1;
        }
    }
}

}  // extern "C"
