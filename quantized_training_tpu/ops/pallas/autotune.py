"""VMEM-budget block-size selection for the Pallas kernels.

The TPU analogue of the reference compiler's footprint-driven tiling search
(reference: codegen/passes/tiling.py:740-914 — enumerate tilings, reject
those over the L2/scratch budget, pick the largest surviving tile).  On TPU
the scratchpad is VMEM (~16 MiB/core on v5e, shared between explicitly
allocated scratch, the double-buffered pipeline tiles, and compiler spill
space), and Mosaic pipelines block DMA automatically — so the search
collapses to: take the largest MXU-friendly block that fits a conservative
VMEM model.  The models below are validated against measured sweeps on a
v5e chip (see ROUND2_NOTES.md): attention at (1024, 1024) runs 1.8x faster
than the previous fixed (256, 512) blocks.
"""

__all__ = ["VMEM_BUDGET", "attention_blocks", "attention_bwd_blocks"]

# Conservative usable-VMEM budget in bytes: 16 MiB physical minus compiler
# headroom (Mosaic reserves scoped/spill space; the hard failure observed at
# ~28 MB requests confirms ~16 MiB hardware, and kernels start failing to
# schedule well above ~12 MiB of explicit use).
VMEM_BUDGET = 12 * 1024 * 1024


def _fits_attention(bq: int, bk: int, d: int, quantized: bool) -> bool:
    """VMEM bytes for one forward attention step, double-buffered tiles.

    q tile (bq, d) bf16; k/v tiles (bk, d) bf16 (x2 for pipelining);
    scores+probs (bq, bk) f32 live in registers/scratch (count one f32 copy
    plus a bf16 copy when an in-kernel p quantizer runs); acc (bq, d) f32;
    m/l row stats negligible; output tile (bq, d).
    """
    tiles = 2 * (bq * d * 2) + 2 * (2 * bk * d * 2)  # q + k,v double-buffered
    scores = bq * bk * 4 + (bq * bk * 2 if quantized else 0)
    acc = bq * d * 4
    out = bq * d * 2
    return tiles + scores + acc + out <= VMEM_BUDGET


def attention_blocks(s: int, t: int, d: int, quantized: bool = False):
    """(block_q, block_k) for the flash forward kernel.

    Largest power-of-two blocks up to 1024 that divide (s, t) and fit the
    VMEM model.  1024 is the measured sweet spot on v5e (beyond it the score
    tile alone crowds out the pipeline; bq=2048 fails to compile).
    """
    def _shrink(bq, bk):
        while not _fits_attention(bq, bk, d, quantized):
            if bk >= bq and bk > 128:
                bk //= 2
            elif bq > 128:
                bq //= 2
            else:
                break
        return bq, bk

    def _largest_dividing(n, cap):
        b = min(cap, n)
        while n % b:
            b //= 2
        return max(b, 1)

    bq = _largest_dividing(s, 1024)
    bk = _largest_dividing(t, 1024)
    return _shrink(bq, bk)


def attention_bwd_blocks(s: int, t: int, d: int):
    """(block_q, block_k) for the dq/dkv backward kernels.

    The backward step holds q, k, v, do tiles plus two (bq, bk) score-sized
    intermediates and a (b*, d) f32 accumulator — roughly 1.5x the forward
    footprint, so cap blocks at 512.
    """
    def _largest_dividing(n, cap):
        b = min(cap, n)
        while n % b:
            b //= 2
        return max(b, 1)

    bq = _largest_dividing(s, 512)
    bk = _largest_dividing(t, 512)
    while 2 * (bq * bk * 4) + 4 * (max(bq, bk) * d * 4) > VMEM_BUDGET:
        if bk >= bq:
            bk //= 2
        else:
            bq //= 2
    return bq, bk


def _divisors_desc(n: int, multiple: int, cap: int):
    """Divisors of n that are multiples of `multiple`, largest first,
    capped."""
    out = [d for d in range(multiple, min(n, cap) + 1, multiple)
           if n % d == 0]
    if n <= cap and n % multiple == 0 and n not in out:
        out.append(n)
    return sorted(set(out), reverse=True)


def storage_matmul_blocks(m: int, k: int, n: int, *, code_bytes: float = 1,
                          scale_block: int = 64, x_factor: int = 1,
                          scale_bytes_per_code: float = 0.0):
    """(block_m, block_k, block_n) for the weight-storage matmul kernels
    (mx/posit codes streamed from HBM, converted in VMEM).

    ``x_factor``: how many activation planes ride along per K-grid step
    (the plane-packed affine kernel passes per = 8/nbits — its x operand is
    (per, M, K/per)).  ``scale_bytes_per_code``: extra streamed qparam bytes
    per code byte (the affine kernel's f32 scale+zp tiles).

    At decode shapes the GEMM is weight-bandwidth-bound, so the goal is the
    widest N tile that fits (one pass over x and the scales; weights stream
    once), then the largest K tile under the VMEM model.  Weight shapes like
    5504 = 128 * 43 have no mid-size divisors — preferring full-N tiles is
    what keeps such layers on the kernel instead of the XLA fallback.
    """
    # Mosaic block rule: a block dim must equal the array dim or be a
    # multiple of the sublane count (8).
    bm = m
    if m > 256:
        bm = 256
        while m % bm or bm % 8:
            bm -= 8
            if bm < 8:
                bm = m  # single tile: always legal
                break

    # Storage kernels get a higher budget than attention: their footprint
    # model below is complete (nothing left to the compiler's discretion),
    # so less headroom is needed under the 16 MiB scoped-vmem hard limit.
    storage_budget = 14 * 1024 * 1024

    def fits(bk, bn):
        x_tiles = 2 * bm * bk * 2 * x_factor
        code_tiles = 2 * bk * bn * (code_bytes + scale_bytes_per_code)
        # the converted bf16 weight tile is real scratch: Mosaic does NOT
        # fold the convert+scale into the dot operand read (an on-chip
        # (256, 5504, 512) run hit the 16 MiB scoped-vmem hard limit at
        # exactly the unfolded footprint).  The plane-packed affine kernel
        # unpacks one (bk, bn) tile per plane (x_factor of them live).
        conv = bk * bn * 2 * x_factor
        acc = bm * bn * 4 + bm * bn * 2
        return x_tiles + code_tiles + conv + acc <= storage_budget

    # the scales tile has block_k/scale_block sublanes — Mosaic requires
    # that to be a multiple of 8 or the whole array, so bk = k or a
    # multiple of 8*scale_block
    bks = [k] + [b for b in (4096, 2048, 1024, 512)
                 if b < k and k % b == 0 and b % (8 * scale_block) == 0]
    for bn in _divisors_desc(n, 128, 8192):
        for bk in sorted(set(bks), reverse=True):
            if fits(bk, bn):
                return bm, bk, bn
    return None
