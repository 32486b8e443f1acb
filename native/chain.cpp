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
#include <cstring>
#include <algorithm>
#include <vector>

#if defined(__AVX512F__)
#include <immintrin.h>
#endif

namespace {

// Gap cost uses integer log2 (minimap2's gamma: a*dd + 0.5*ilog2(dd)):
// ilog2(dd+1) extracted from the float exponent. int->float conversion is
// round-to-nearest in every implementation (scalar, AVX, XLA), so the JAX
// scan fallback (ops/chain_scan.py) reproduces this bit for bit.
inline int32_t ilog2_via_float(int32_t x) {
    const float f = static_cast<float>(x);
    int32_t bits;
    std::memcpy(&bits, &f, 4);
    return (bits >> 23) - 127;
}

void chain_dp_scalar(const int32_t* qpos, const int32_t* rpos,
                     const int32_t* group, int64_t n, int32_t k,
                     int32_t lookback, int32_t max_dist, int32_t max_gap_diff,
                     float gap_scale, float* f_out, int64_t* parent_out) {
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
            const float gap_cost =
                gap_scale * static_cast<float>(dd)
                + 0.5f * static_cast<float>(ilog2_via_float(dd + 1));
            const float cand = f_out[j] + match - gap_cost;
            if (cand > best) {
                best = cand;
                parent = j;
            }
        }
        // Extending must beat starting fresh (parity with the scan kernel).
        f_out[i] = best;
        parent_out[i] = parent;
    }
}

#if defined(__AVX512F__)
// Branchless 16-lane inner loop. Semantics identical to the scalar loop:
// strict > updates keep the EARLIEST j per lane; cross-lane ties resolve to
// the smallest j in the horizontal reduction.
void chain_dp_avx512(const int32_t* qpos, const int32_t* rpos,
                     const int32_t* group, int64_t n, int32_t k,
                     int32_t lookback, int32_t max_dist, int32_t max_gap_diff,
                     float gap_scale, float* f_out, int64_t* parent_out) {
    const float kf = static_cast<float>(k);
    const __m512i vk = _mm512_set1_epi32(k);
    const __m512i v127 = _mm512_set1_epi32(127);
    const __m512i vone = _mm512_set1_epi32(1);
    const __m512i vmdist = _mm512_set1_epi32(max_dist);
    const __m512i vmgap = _mm512_set1_epi32(max_gap_diff);
    const __m512 vgap_scale = _mm512_set1_ps(gap_scale);
    const __m512 vhalf = _mm512_set1_ps(0.5f);
    const __m512 vneg = _mm512_set1_ps(-1e30f);
    const __m512i viota = _mm512_set_epi32(15, 14, 13, 12, 11, 10, 9, 8,
                                           7, 6, 5, 4, 3, 2, 1, 0);
    const __m512i vzero = _mm512_setzero_si512();

    alignas(64) float bests[16];
    alignas(64) int32_t parents[16];

    for (int64_t i = 0; i < n; ++i) {
        const int64_t j0 = i > lookback ? i - lookback : 0;
        const __m512i vqi = _mm512_set1_epi32(qpos[i]);
        const __m512i vri = _mm512_set1_epi32(rpos[i]);
        const __m512i vgi = _mm512_set1_epi32(group[i]);
        __m512 vbest = vneg;
        __m512i vparent = _mm512_set1_epi32(-1);
        for (int64_t j = j0; j < i; j += 16) {
            const int64_t rem = i - j;
            const __mmask16 m =
                rem >= 16 ? static_cast<__mmask16>(0xFFFF)
                          : static_cast<__mmask16>((1u << rem) - 1u);
            const __m512i vq = _mm512_maskz_loadu_epi32(m, qpos + j);
            const __m512i vr = _mm512_maskz_loadu_epi32(m, rpos + j);
            const __m512i vg = _mm512_maskz_loadu_epi32(m, group + j);
            const __m512i dq = _mm512_sub_epi32(vqi, vq);
            const __m512i dr = _mm512_sub_epi32(vri, vr);
            const __m512i dd = _mm512_abs_epi32(_mm512_sub_epi32(dr, dq));
            __mmask16 ok = m & _mm512_cmpeq_epi32_mask(vg, vgi);
            ok &= _mm512_cmpgt_epi32_mask(dq, vzero);
            ok &= _mm512_cmpgt_epi32_mask(dr, vzero);
            ok &= _mm512_cmple_epi32_mask(dq, vmdist);
            ok &= _mm512_cmple_epi32_mask(dr, vmdist);
            ok &= _mm512_cmple_epi32_mask(dd, vmgap);
            if (!ok) continue;
            const __m512 vf = _mm512_maskz_loadu_ps(ok, f_out + j);
            const __m512 match = _mm512_cvtepi32_ps(
                _mm512_min_epi32(_mm512_min_epi32(dq, dr), vk));
            // ilog2(dd+1) from the float exponent field.
            const __m512 fdd1 = _mm512_cvtepi32_ps(_mm512_add_epi32(dd, vone));
            const __m512 ilog = _mm512_cvtepi32_ps(_mm512_sub_epi32(
                _mm512_srli_epi32(_mm512_castps_si512(fdd1), 23), v127));
            const __m512 cost = _mm512_fmadd_ps(
                vgap_scale, _mm512_cvtepi32_ps(dd), _mm512_mul_ps(vhalf, ilog));
            const __m512 cand = _mm512_mask_mov_ps(
                vneg, ok, _mm512_sub_ps(_mm512_add_ps(vf, match), cost));
            const __mmask16 upd = _mm512_cmp_ps_mask(cand, vbest, _CMP_GT_OQ);
            vbest = _mm512_mask_mov_ps(vbest, upd, cand);
            vparent = _mm512_mask_mov_epi32(
                vparent, upd,
                _mm512_add_epi32(_mm512_set1_epi32(static_cast<int32_t>(j)),
                                 viota));
        }
        const float bmax = _mm512_reduce_max_ps(vbest);
        if (bmax > kf) {
            _mm512_store_ps(bests, vbest);
            _mm512_store_si512(reinterpret_cast<__m512i*>(parents), vparent);
            int32_t pmin = INT32_MAX;
            for (int l = 0; l < 16; ++l)
                if (bests[l] == bmax && parents[l] < pmin) pmin = parents[l];
            f_out[i] = bmax;
            parent_out[i] = pmin;
        } else {
            f_out[i] = kf;
            parent_out[i] = -1;
        }
    }
}
#endif  // __AVX512F__

}  // namespace

extern "C" {

void chain_dp(const int32_t* qpos, const int32_t* rpos, const int32_t* group,
              int64_t n, int32_t k, int32_t lookback,
              float max_dist, float max_gap_diff, float gap_scale,
              float* f_out, int64_t* parent_out) {
    // Clamp before casting: a configured limit >= 2^31 (or inf) must behave
    // as "no limit", not wrap to INT32_MIN (float->int overflow is UB).
    const int32_t mdist = (!(max_dist < 2147483647.0f))
        ? INT32_MAX : static_cast<int32_t>(max_dist);
    const int32_t mgap = (!(max_gap_diff < 2147483647.0f))
        ? INT32_MAX : static_cast<int32_t>(max_gap_diff);
#if defined(__AVX512F__)
    if (n <= INT32_MAX) {
        chain_dp_avx512(qpos, rpos, group, n, k, lookback, mdist, mgap,
                        gap_scale, f_out, parent_out);
        return;
    }
#endif
    chain_dp_scalar(qpos, rpos, group, n, k, lookback, mdist, mgap,
                    gap_scale, f_out, parent_out);
}

// Greedy chain extraction: walk parent links back from best-scoring tails.
//
// cand must be pre-sorted by descending cumulative score. Each path stops at
// the first already-used anchor; its own score is f[tail] - f[anchor below the
// cut] (branch shadows of a long chain must not inherit its full score).
// Anchors of rejected (too short / too weak) paths stay marked used, matching
// the host fallback. Paths are emitted ascending into out_idx, back to back;
// out_start gets n_chains+1 offsets (last = total length).
//
// Returns the number of accepted chains. Caller buffers: out_idx of size n,
// out_start/out_score of size n/min_anchors + 1.
// Candidate selection + descending stable sort + extraction in one call:
// picks tails with score >= min_chain_score, orders them by (score desc,
// index asc) via a radix sort on a packed key, then extracts. Equivalent to
// chain_extract(cand = argsort-desc(nonzero(scores >= min))).
int64_t chain_select_extract(const float* scores, const int64_t* parents,
                             int64_t n, float min_chain_score,
                             int64_t min_anchors, int64_t* out_idx,
                             int64_t* out_start, float* out_score);

int64_t chain_extract(const float* scores, const int64_t* parents, int64_t n,
                      const int64_t* cand, int64_t n_cand,
                      float min_chain_score, int64_t min_anchors,
                      int64_t* out_idx, int64_t* out_start, float* out_score) {
    // Reused across calls (see sort_anchors): fresh vectors fault pages at
    // VM-restore speed on this host class.
    static thread_local std::vector<uint8_t> used;
    used.assign(static_cast<size_t>(n), 0);
    int64_t n_chains = 0;
    int64_t out_pos = 0;
    for (int64_t c = 0; c < n_cand; ++c) {
        const int64_t tail = cand[c];
        if (used[tail]) continue;
        const int64_t start = out_pos;
        int64_t j = tail;
        while (j >= 0 && !used[j]) {
            out_idx[out_pos++] = j;
            used[j] = 1;
            j = parents[j];
        }
        const float own = scores[tail] - (j >= 0 ? scores[j] : 0.0f);
        if (out_pos - start < min_anchors || own < min_chain_score) {
            out_pos = start;
            continue;
        }
        std::reverse(out_idx + start, out_idx + out_pos);
        out_start[n_chains] = start;
        out_score[n_chains] = own;
        ++n_chains;
    }
    out_start[n_chains] = out_pos;
    return n_chains;
}

int64_t chain_select_extract(const float* scores, const int64_t* parents,
                             int64_t n, float min_chain_score,
                             int64_t min_anchors, int64_t* out_idx,
                             int64_t* out_start, float* out_score) {
    // Pack (score desc, index asc) into a u64 key. Floats here are
    // non-negative (chain scores), so the sign-flip trick reduces to setting
    // the top bit; complementing yields descending order.
    static thread_local std::vector<uint64_t> keys;
    keys.clear();
    keys.reserve(1024);
    for (int64_t i = 0; i < n; ++i) {
        if (scores[i] >= min_chain_score) {
            uint32_t u;
            std::memcpy(&u, &scores[i], 4);
            const uint32_t asc = u | 0x80000000u;  // non-negative floats
            keys.push_back((static_cast<uint64_t>(~asc) << 32)
                           | static_cast<uint64_t>(i & 0xFFFFFFFF));
        }
    }
    const int64_t n_cand = static_cast<int64_t>(keys.size());
    // LSD radix, 4 x 16-bit digits. Buffers reused across calls.
    static thread_local std::vector<uint64_t> tmp;
    static thread_local std::vector<int64_t> count;
    tmp.resize(n_cand);
    count.resize(1 << 16);
    for (int pass = 0; pass < 4; ++pass) {
        const int shift = pass * 16;
        std::fill(count.begin(), count.end(), 0);
        for (int64_t i = 0; i < n_cand; ++i)
            ++count[(keys[i] >> shift) & 0xFFFF];
        int64_t sum = 0;
        for (auto& c : count) { const int64_t t = c; c = sum; sum += t; }
        for (int64_t i = 0; i < n_cand; ++i)
            tmp[count[(keys[i] >> shift) & 0xFFFF]++] = keys[i];
        keys.swap(tmp);
    }
    static thread_local std::vector<int64_t> cand;
    cand.resize(n_cand);
    for (int64_t i = 0; i < n_cand; ++i)
        cand[i] = static_cast<int64_t>(keys[i] & 0xFFFFFFFF);
    return chain_extract(scores, parents, n, cand.data(), n_cand,
                         min_chain_score, min_anchors, out_idx, out_start,
                         out_score);
}

}  // extern "C"
