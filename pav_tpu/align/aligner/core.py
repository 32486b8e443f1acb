"""Aligner core: chains -> base-level =/X CIGAR alignment records.

All inter-anchor gap segments from every contig are gathered first, bucketed by
(length, band) into static shapes, aligned in batched device DP calls
(pav_tpu.ops.affine_dp), then stitched back into per-chain CIGARs — maximizing
device batch occupancy instead of aligning contig-by-contig.

Produces the reference's alignment-table records directly (no SAM round-trip);
schema: API_ALIGN.md:31-64.
"""

import collections

import numpy as np
import pandas as pd

from ... import seqcodec
from ...ops import affine_dp
from .. import cigar as cg
from ..table import ALIGN_COLUMNS, empty_align_table, sort_align_table
from .chain import find_chains
from .index import MinimizerIndex

_MIN_WIDTH = 65
_DIRECT_MISMATCH_FRAC = 0.05


def _bucket_pow2(x, lo=32, hi=1 << 15):
    v = lo
    while v < x and v < hi:
        v <<= 1
    return v


class _Segment:
    __slots__ = ('chain_id', 'slot', 'q', 'r', 'kind', 'result')

    def __init__(self, chain_id, slot, q, r):
        self.chain_id = chain_id
        self.slot = slot
        self.q = q
        self.r = r
        self.result = None


class Aligner:
    """Contig-to-reference aligner over SeqStores."""

    def __init__(self, ref_store, config=None):
        cfg = config or {}
        self.ref_store = ref_store
        self.k = int(cfg.get('aligner_k', 19))
        self.w = int(cfg.get('aligner_w', 10))
        self.max_occ = int(cfg.get('aligner_max_occ', 64))
        self.chain_max_dist = int(cfg.get('aligner_chain_max_dist', 50000))
        self.chain_max_gap = int(cfg.get('aligner_chain_max_gap_diff', 10000))
        self.min_chain_score = float(cfg.get('aligner_min_chain_score', 1000))
        scoring = {
            'match': int(cfg.get('aligner_match', 1)),
            'mismatch': int(cfg.get('aligner_mismatch', -5)),
            'gap_open': tuple(cfg.get('aligner_gap_open', (5, 56))),
            'gap_ext': tuple(cfg.get('aligner_gap_ext', (4, 1))),
        }
        self.dp = affine_dp.BandedAligner(scoring)
        self.index = MinimizerIndex(ref_store, k=self.k, w=self.w)

    # ------------------------------------------------------------------ align

    def align_store(self, qry_store, hap, batch_count=10, min_chain_score=None):
        """Align every contig of a haplotype store; return the alignment table
        (trim-none tier, CALL_BATCH/TRIM fields not yet added)."""
        min_score = self.min_chain_score if min_chain_score is None else min_chain_score

        chain_meta = []   # per chain: dict with contig info + parts layout
        segments = []     # DP jobs across all chains

        for qry_name in qry_store.names():
            codes = qry_store.get(qry_name)
            chains = find_chains(
                codes, self.index, max_occ=self.max_occ,
                max_dist=self.chain_max_dist, max_gap_diff=self.chain_max_gap,
                min_chain_score=min_score)
            oriented_cache = {}
            for chain in chains:
                if chain.is_rev not in oriented_cache:
                    oriented_cache[chain.is_rev] = (
                        seqcodec.revcomp(codes) if chain.is_rev else codes)
                self._plan_chain(
                    chain, qry_name, len(codes), oriented_cache[chain.is_rev],
                    chain_meta, segments)

        self._run_segments(segments)
        return self._emit_table(chain_meta, segments, hap)

    # ------------------------------------------------------------- chain plan

    def _plan_chain(self, chain, qry_name, qlen, oriented, chain_meta, segments):
        """Decompose a chain into exact runs and DP segments; register jobs."""
        k = self.k
        ref = self.ref_store.get(self.index.chrom_names[chain.chrom_id])
        qpos, rpos = chain.qpos, chain.rpos

        parts = []  # list of ('cig', lens, ops) or ('seg', segment_index)
        chain_id = len(chain_meta)

        run_q = int(qpos[0])
        run_r = int(rpos[0])
        run_len = k  # current exact run covers [run_q, run_q + run_len)

        def close_run(cut=0):
            nonlocal run_len
            eff = run_len - cut
            if eff > 0:
                parts.append(('cig',
                              np.array([eff], dtype=np.int32),
                              np.array([cg.EQ], dtype=np.int8)))
            run_len = eff

        for a in range(1, chain.n_anchors):
            q0, r0 = int(qpos[a - 1]), int(rpos[a - 1])
            q1, r1 = int(qpos[a]), int(rpos[a])
            dq, dr = q1 - q0, r1 - r0
            if dq == dr and dq <= k:
                run_len += dq
                continue
            # Close the current run, shrinking it if the next anchor overlaps it.
            cut = max(0, k - dq, k - dr)
            close_run(cut)
            seg_q0 = q0 + k - cut
            seg_r0 = r0 + k - cut
            sq = oriented[seg_q0:q1]
            sr = ref[seg_r0:r1]
            self._add_segment(chain_id, len(parts), sq, sr, parts, segments)
            run_q, run_r, run_len = q1, r1, k

        close_run(0)

        q_start = int(qpos[0])
        q_end = int(qpos[-1]) + k
        r_start = int(rpos[0])
        r_end = int(rpos[-1]) + k

        chain_meta.append({
            'qry_name': qry_name, 'qlen': qlen, 'is_rev': chain.is_rev,
            'chrom': self.index.chrom_names[chain.chrom_id],
            'q_start': q_start, 'q_end': q_end,
            'r_start': r_start, 'r_end': r_end,
            'score': chain.score, 'n_anchors': chain.n_anchors,
            'mapq': 60,
            'parts': parts,
        })

    def _add_segment(self, chain_id, slot, sq, sr, parts, segments):
        """Register one inter-anchor gap; fast paths avoid DP when possible."""
        lq, lr = len(sq), len(sr)
        if lq == 0 and lr == 0:
            return
        if lq == 0:
            parts.append(('cig', np.array([lr], dtype=np.int32),
                          np.array([cg.D], dtype=np.int8)))
            return
        if lr == 0:
            parts.append(('cig', np.array([lq], dtype=np.int32),
                          np.array([cg.I], dtype=np.int8)))
            return
        if lq == lr:
            mism = (sq != sr) | (sq >= 4)
            if mism.sum() <= max(2, _DIRECT_MISMATCH_FRAC * lq):
                lens, ops = _compare_run(sq, sr)
                parts.append(('cig', lens, ops))
                return
        seg = _Segment(chain_id, slot, sq, sr)
        parts.append(('seg', len(segments)))
        segments.append(seg)

    # ------------------------------------------------------------ DP batching

    def _run_segments(self, segments):
        """Bucket DP jobs into static shapes and run batched kernel calls."""
        buckets = collections.defaultdict(list)
        for si, seg in enumerate(segments):
            m, n = len(seg.q), len(seg.r)
            width = min(2 * abs(m - n) + _MIN_WIDTH, n + 1)
            width_b = _bucket_pow2(width, lo=_MIN_WIDTH, hi=1 << 15) + 1
            width_b = min(width_b, n + 1)
            m_b = _bucket_pow2(m, lo=32)
            buckets[(m_b, max(width_b, _MIN_WIDTH))].append(si)

        for (m_b, width_b), idx_list in sorted(buckets.items()):
            # Chunk so traceback tensors stay bounded (~256 MB).
            max_batch = max(1, (256 << 20) // max(m_b * width_b, 1))
            for lo in range(0, len(idx_list), max_batch):
                chunk = idx_list[lo:lo + max_batch]
                pairs = [(segments[i].q, segments[i].r) for i in chunk]
                try:
                    results = self.dp.align_batch(pairs, width=width_b)
                except RuntimeError:
                    # Band too narrow for some path: retry whole chunk full-width.
                    full_w = max(len(r) for _, r in pairs) + 1
                    results = self.dp.align_batch(pairs, width=full_w)
                for i, res in zip(chunk, results):
                    segments[i].result = res

    # ----------------------------------------------------------------- output

    def _emit_table(self, chain_meta, segments, hap):
        rows = []
        for index, meta in enumerate(chain_meta):
            lens_list, ops_list = [], []
            if meta['q_start'] > 0:
                lens_list.append(np.array([meta['q_start']], dtype=np.int32))
                ops_list.append(np.array([cg.H], dtype=np.int8))
            for part in meta['parts']:
                if part[0] == 'cig':
                    lens_list.append(part[1])
                    ops_list.append(part[2])
                else:
                    res = segments[part[1]].result
                    if res is None:
                        raise AssertionError('unresolved segment part')
                    lens_list.append(res[0])
                    ops_list.append(res[1])
            tail = meta['qlen'] - meta['q_end']
            if tail > 0:
                lens_list.append(np.array([tail], dtype=np.int32))
                ops_list.append(np.array([cg.H], dtype=np.int8))

            lens = np.concatenate(lens_list)
            ops = np.concatenate(ops_list)
            lens, ops = cg.merge_adjacent(lens, ops)

            qlen = meta['qlen']
            if meta['is_rev']:
                qry_pos = qlen - meta['q_end']
                qry_end = qlen - meta['q_start']
            else:
                qry_pos = meta['q_start']
                qry_end = meta['q_end']

            flag = 0x10 if meta['is_rev'] else 0x0
            rows.append((
                meta['chrom'], meta['r_start'], meta['r_end'],
                index, meta['qry_name'],
                qry_pos, qry_end, qlen,
                'NA', 'NA', meta['mapq'],
                meta['is_rev'], f'0x{flag:04x}',
                hap, cg.to_string(lens, ops),
            ))

        df = pd.DataFrame(rows, columns=ALIGN_COLUMNS) if rows else empty_align_table()
        return sort_align_table(df)


def _compare_run(sq, sr):
    """Equal-length direct comparison -> =/X run-length CIGAR."""
    mism = ((sq != sr) | (sq >= 4)).astype(np.int8)
    ops = np.where(mism == 1, cg.X, cg.EQ).astype(np.int8)
    lens = np.ones(len(ops), dtype=np.int32)
    return cg.merge_adjacent(lens, ops)
