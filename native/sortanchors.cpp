// Native anchor sort: LSD radix over a packed (group, rpos, qpos) key with
// direct emission of the permuted anchor arrays — replaces an argsort plus
// four fancy-index gathers over tens of millions of anchors per contig.
//
// Key layout (63 bits): group[7] | rpos[28] | qpos[28]. Returns -1 when any
// field exceeds its range (caller falls back to the numpy sort).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

int64_t sort_anchors(const int64_t* qpos, const int64_t* rpos,
                     const int32_t* chrom, const uint8_t* rev, int64_t n,
                     int64_t* out_qpos, int64_t* out_rpos, int64_t* out_group,
                     int32_t* out_chrom, uint8_t* out_rev) {
    constexpr int64_t kMax28 = (1ll << 28) - 1;
    std::vector<uint64_t> key(n);
    std::vector<uint32_t> idx(n), idx2(n);
    std::vector<uint64_t> key2(n);

    for (int64_t i = 0; i < n; ++i) {
        const int64_t g = static_cast<int64_t>(chrom[i]) * 2 + (rev[i] ? 1 : 0);
        if (g >= 128 || qpos[i] > kMax28 || rpos[i] > kMax28 ||
            qpos[i] < 0 || rpos[i] < 0) {
            return -1;
        }
        key[i] = (static_cast<uint64_t>(g) << 56)
                 | (static_cast<uint64_t>(rpos[i]) << 28)
                 | static_cast<uint64_t>(qpos[i]);
        idx[i] = static_cast<uint32_t>(i);
    }

    // 4 passes of 16-bit digits (63-bit key).
    std::vector<int64_t> count(1 << 16);
    for (int pass = 0; pass < 4; ++pass) {
        const int shift = pass * 16;
        std::memset(count.data(), 0, count.size() * sizeof(int64_t));
        for (int64_t i = 0; i < n; ++i)
            ++count[(key[i] >> shift) & 0xFFFF];
        int64_t sum = 0;
        for (auto& c : count) { const int64_t t = c; c = sum; sum += t; }
        for (int64_t i = 0; i < n; ++i) {
            const int64_t pos = count[(key[i] >> shift) & 0xFFFF]++;
            key2[pos] = key[i];
            idx2[pos] = idx[i];
        }
        key.swap(key2);
        idx.swap(idx2);
    }

    for (int64_t i = 0; i < n; ++i) {
        const uint32_t j = idx[i];
        out_qpos[i] = qpos[j];
        out_rpos[i] = rpos[j];
        out_group[i] = static_cast<int64_t>(chrom[j]) * 2 + (rev[j] ? 1 : 0);
        out_chrom[i] = chrom[j];
        out_rev[i] = rev[j];
    }
    return 0;
}

}  // extern "C"
