"""Format recommendation from calibration telemetry.

The reference records per-observer exponent histograms for offline analysis
(reference fake_quantize.py:348-350, histogram.py); this module closes the
loop: given a ``quant_histogram`` collection from a calibration run, it
recommends, per site, the cheapest number format whose representable
exponent window covers the observed dynamic range.

Model (direct-rounding mode — the paper's forward path quantizes tensors
in-place, no per-tensor scale):

- a site's *useful window* is the smallest exponent interval holding
  ``coverage`` of the nonzero mass (tails are noise/outliers the formats
  saturate gracefully on);
- a format *fits* when that window lies inside its representable exponent
  range (posit ranges are the es-taper bounds; FP ranges include
  subnormals);
- ties break toward the format with more significand bits near the window's
  mass center (posit beats fpN when the center is within the taper's
  high-precision zone, |exp| <= nbits/2 roughly).

For scale-carrying schemes the question is width, not placement: int8 with
a per-tensor/block scale fits whenever the window span is at most the
format's magnitude bits.
"""

from typing import Dict, List, Optional

import numpy as np

from .histogram import MIN_EXP, NUM_BINS

__all__ = ["FORMAT_EXP_RANGES", "recommend_formats", "render_recommendations"]

# Representable exponent windows [min_exp, max_exp] (value magnitude
# 2^min_exp .. 2^max_exp), including subnormals for the FP formats and the
# taper extremes for posits (posit(8,es): max = (2^2^es)^(nbits-2)).
FORMAT_EXP_RANGES = {
    "posit8_1": (-12, 12),
    "posit8_2": (-24, 24),
    "fp8_e4m3": (-9, 8),     # OCP E4M3: subnormal 2^-9, max 448 < 2^9
    "fp8_e5m2": (-16, 15),   # E5M2: subnormal 2^-16, max 57344 < 2^16
}
# High-precision taper zone half-width (posit formats concentrate
# significand bits near exponent 0).
_POSIT_SWEET = {"posit8_1": 6, "posit8_2": 12}
_BITS = {"posit8_1": 8, "posit8_2": 8, "fp8_e4m3": 8, "fp8_e5m2": 8}


def _window(hist: np.ndarray, coverage: float):
    """Smallest [lo_exp, hi_exp] holding >= coverage of nonzero mass."""
    hist = np.asarray(hist, np.float64)
    total = hist.sum()
    if total == 0:
        return None
    exps = np.arange(MIN_EXP, MIN_EXP + NUM_BINS)
    # trim equal mass from both tails until coverage remains
    cdf = np.cumsum(hist) / total
    lo_i = int(np.searchsorted(cdf, (1 - coverage) / 2, side="left"))
    hi_i = int(np.searchsorted(cdf, 1 - (1 - coverage) / 2, side="left"))
    nz = np.nonzero(hist)[0]
    lo_i = max(lo_i, nz[0])
    hi_i = min(max(hi_i, lo_i), nz[-1])
    center = float((exps * hist).sum() / total)
    return int(exps[lo_i]), int(exps[hi_i]), center


def recommend_formats(
    histograms: Dict, coverage: float = 0.999,
    candidates: Optional[List[str]] = None,
) -> Dict[str, Dict]:
    """{site: {window, center, fits, direct, scaled_int8}} per observer.

    ``histograms`` is a ``quant_histogram`` collection (or any pytree of
    254-bin arrays).  ``direct`` is the recommended direct-rounding format
    (None when nothing covers the window — use a scaled scheme);
    ``scaled_int8`` reports the narrowest intN that works with a per-tensor
    scale (span-based).
    """
    from .histogram import _collect

    candidates = candidates or list(FORMAT_EXP_RANGES)
    out = {}
    for name, hist in _collect(histograms).items():
        w = _window(hist, coverage)
        if w is None:
            out[name] = {"window": None, "center": None, "fits": [],
                         "direct": None, "scaled_int8": None}
            continue
        lo, hi, center = w
        fits = [f for f in candidates
                if FORMAT_EXP_RANGES[f][0] <= lo
                and hi <= FORMAT_EXP_RANGES[f][1]]

        def rank(f):
            # prefer posit when the mass center sits in its taper sweet
            # zone; otherwise the tightest covering range wins
            sweet = _POSIT_SWEET.get(f)
            in_sweet = sweet is not None and abs(center) <= sweet
            span = FORMAT_EXP_RANGES[f][1] - FORMAT_EXP_RANGES[f][0]
            return (_BITS[f], 0 if in_sweet else 1, span)

        direct = min(fits, key=rank) if fits else None
        span = hi - lo
        # intN + scale covers span <= N-1 magnitude bits (sign takes one)
        scaled = next((f"int{n}" for n in (4, 6, 8) if span <= n - 1), None)
        out[name] = {"window": (lo, hi), "center": round(center, 2),
                     "fits": fits, "direct": direct, "scaled_int8": scaled}
    return out


def render_recommendations(recs: Dict[str, Dict]) -> str:
    """Human-readable table."""
    lines = [f"{'site':60s} {'window':>12s} {'center':>7s} "
             f"{'direct':>10s} {'scaled':>7s}"]
    for name in sorted(recs):
        r = recs[name]
        win = ("-" if r["window"] is None
               else f"[{r['window'][0]},{r['window'][1]}]")
        lines.append(
            f"{name:60.60s} {win:>12s} "
            f"{('-' if r['center'] is None else r['center']):>7} "
            f"{(r['direct'] or '-'):>10s} {(r['scaled_int8'] or '-'):>7s}")
    return "\n".join(lines)
