// Native anchor sort: LSD radix over a packed (group, rpos, qpos) key with
// direct emission of the permuted anchor arrays — replaces an argsort plus
// four fancy-index gathers over tens of millions of anchors per contig.
//
// Key layout (<= 64 bits): group | rpos | qpos with bit widths sized to the
// actual maxima (a 3 Gbp chromosome needs 32 rpos bits; 24 chroms x 2
// strands need 6 group bits — both fit). Returns -1 only when the combined
// widths exceed 64 bits (caller falls back to the numpy sort).
//
// The key encodes every emitted field, so the sort moves ONLY the 8-byte
// keys (no index permutation) and the outputs are decoded sequentially from
// the sorted keys — ~2.5x less memory traffic than a key+index sort with a
// final random gather. Passes whose digit is constant across all keys are
// skipped (small genomes use neither the high rpos bits nor many groups).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {
inline int bits_for(int64_t maxval) {
    int b = 1;
    while ((1ll << b) <= maxval) ++b;
    return b;
}
}  // namespace

namespace {

template <typename P, typename G>
int64_t sort_anchors_impl(const P* qpos, const P* rpos,
                          const int32_t* chrom, const uint8_t* rev, int64_t n,
                          P* out_qpos, P* out_rpos, G* out_group,
                          int32_t* out_chrom, uint8_t* out_rev) {
    // Reused across calls: fresh large vectors fault pages at VM-restore
    // speed on this class of host. Guarded by the caller (one call per
    // planning thread; glibc arenas are shared but vectors are per-thread).
    static thread_local std::vector<uint64_t> key_buf, key2_buf;
    key_buf.resize(n);
    key2_buf.resize(n);
    uint64_t* key = key_buf.data();
    uint64_t* key2 = key2_buf.data();

    int64_t max_q = 0, max_r = 0, max_g = 1;
    for (int64_t i = 0; i < n; ++i) {
        if (qpos[i] < 0 || rpos[i] < 0 || chrom[i] < 0) return -1;
        if (qpos[i] > max_q) max_q = qpos[i];
        if (rpos[i] > max_r) max_r = rpos[i];
        const int64_t g = static_cast<int64_t>(chrom[i]) * 2 + 1;
        if (g > max_g) max_g = g;
    }
    const int bq = bits_for(max_q), br = bits_for(max_r), bg = bits_for(max_g);
    if (bq + br + bg > 64) return -1;
    const int sh_r = bq, sh_g = bq + br;
    const uint64_t mask_q = (bq >= 64) ? ~0ULL : ((1ULL << bq) - 1);
    const uint64_t mask_r = (1ULL << br) - 1;

    uint64_t all_or = 0, all_and = ~0ULL;
    for (int64_t i = 0; i < n; ++i) {
        const uint64_t g = static_cast<uint64_t>(chrom[i]) * 2 + (rev[i] ? 1 : 0);
        const uint64_t k = (g << sh_g)
                           | (static_cast<uint64_t>(rpos[i]) << sh_r)
                           | static_cast<uint64_t>(qpos[i]);
        key[i] = k;
        all_or |= k;
        all_and &= k;
    }

    // 4 passes of 16-bit digits (63-bit key); constant digits need no pass.
    // Large inputs (repeat screens yield tens of millions of anchors per
    // contig) histogram and scatter chunk-parallel: per-chunk histograms
    // combine into per-(chunk, digit) start offsets, and each thread
    // scatters its own chunk — stable, race-free (disjoint destinations).
    static thread_local std::vector<int64_t> count;
    // hardware_concurrency() may legally return 0 (restricted containers);
    // never let n_thr reach 0 (chunk division below).
    const int n_thr = (n >= (8 << 20))
        ? static_cast<int>(std::min(
              4u, std::max(1u, std::thread::hardware_concurrency())))
        : 1;
    count.resize((1 << 16) * static_cast<size_t>(n_thr));
    const int64_t chunk = (n + n_thr - 1) / n_thr;
    for (int pass = 0; pass < 4; ++pass) {
        const int shift = pass * 16;
        if (((all_or >> shift) & 0xFFFF) == ((all_and >> shift) & 0xFFFF))
            continue;
        std::memset(count.data(), 0,
                    count.size() * sizeof(int64_t));
        // Grab the pointer on the CALLING thread: `count` is thread_local,
        // so worker threads must not evaluate count.data() themselves.
        int64_t* cbase = count.data();
        auto hist = [&, cbase](int t) {
            int64_t* c = cbase + (static_cast<size_t>(t) << 16);
            const int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
            for (int64_t i = lo; i < hi; ++i)
                ++c[(key[i] >> shift) & 0xFFFF];
        };
        if (n_thr > 1) {
            std::vector<std::thread> ths;
            for (int t = 0; t < n_thr; ++t) ths.emplace_back(hist, t);
            for (auto& th : ths) th.join();
        } else {
            hist(0);
        }
        // Exclusive prefix over (digit, chunk) in digit-major order.
        int64_t sum = 0;
        for (int d = 0; d < (1 << 16); ++d) {
            for (int t = 0; t < n_thr; ++t) {
                int64_t& c = count[(static_cast<size_t>(t) << 16) + d];
                const int64_t v = c;
                c = sum;
                sum += v;
            }
        }
        auto scatter = [&, cbase](int t) {
            int64_t* c = cbase + (static_cast<size_t>(t) << 16);
            const int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
            for (int64_t i = lo; i < hi; ++i)
                key2[c[(key[i] >> shift) & 0xFFFF]++] = key[i];
        };
        if (n_thr > 1) {
            std::vector<std::thread> ths;
            for (int t = 0; t < n_thr; ++t) ths.emplace_back(scatter, t);
            for (auto& th : ths) th.join();
        } else {
            scatter(0);
        }
        uint64_t* t = key; key = key2; key2 = t;
    }

    for (int64_t i = 0; i < n; ++i) {
        const uint64_t k = key[i];
        const int64_t g = static_cast<int64_t>(k >> sh_g);
        out_qpos[i] = static_cast<P>(k & mask_q);
        out_rpos[i] = static_cast<P>((k >> sh_r) & mask_r);
        out_group[i] = static_cast<G>(g);
        out_chrom[i] = static_cast<int32_t>(g >> 1);
        out_rev[i] = static_cast<uint8_t>(g & 1);
    }
    return 0;
}

}  // namespace

extern "C" {

int64_t sort_anchors(const int64_t* qpos, const int64_t* rpos,
                     const int32_t* chrom, const uint8_t* rev, int64_t n,
                     int64_t* out_qpos, int64_t* out_rpos, int64_t* out_group,
                     int32_t* out_chrom, uint8_t* out_rev) {
    return sort_anchors_impl(qpos, rpos, chrom, rev, n,
                             out_qpos, out_rpos, out_group, out_chrom, out_rev);
}

// int32 variant: the anchor fast path (index_fill_anchors emits int32);
// halves key-build read traffic and the output writes.
int64_t sort_anchors32(const int32_t* qpos, const int32_t* rpos,
                       const int32_t* chrom, const uint8_t* rev, int64_t n,
                       int32_t* out_qpos, int32_t* out_rpos, int32_t* out_group,
                       int32_t* out_chrom, uint8_t* out_rev) {
    return sort_anchors_impl(qpos, rpos, chrom, rev, n,
                             out_qpos, out_rpos, out_group, out_chrom, out_rev);
}

}  // extern "C"
