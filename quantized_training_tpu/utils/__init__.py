"""Utilities: evaluation protocols and numeric telemetry."""

from .evaluation import (
    sliding_window_perplexity,
    squad_em_f1,
    postprocess_qa_predictions,
)
from .recommend import (
    recommend_formats,
    render_recommendations,
)
from .histogram import (
    exponent_histogram,
    histogram_summary,
    plot_histogram,
    plot_layer_range,
)

__all__ = [
    "sliding_window_perplexity",
    "squad_em_f1",
    "postprocess_qa_predictions",
    "exponent_histogram",
    "histogram_summary",
    "plot_histogram",
    "plot_layer_range",
]
