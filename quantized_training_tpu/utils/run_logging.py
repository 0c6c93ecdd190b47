"""Run management: logging setup, W&B integration, sweeps.

Equivalent of the reference's harness utilities (reference: utils.py:75-144
``setup_logging`` decorator with log file + W&B init/sweep/agent, and the
grid-sweep dictionaries in sweep_config.py).  W&B is optional: everything
degrades to stdlib logging when wandb is absent or offline.
"""

import functools
import json
import logging
import os
import sys
from typing import Callable, Dict, Optional

__all__ = ["setup_logging", "log_metrics", "SWEEP_CONFIGS", "run_sweep"]


def setup_logging(log_file: Optional[str] = None, level: str = "INFO",
                  project: Optional[str] = None,
                  run_name: Optional[str] = None,
                  run_id: Optional[str] = None,
                  config: Optional[Dict] = None):
    """Configure logging (+ optionally W&B).  Returns a ``log_metrics``-style
    callable.  As a decorator-free function it composes with any driver.
    """
    handlers = [logging.StreamHandler(sys.stdout)]
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        handlers.append(logging.FileHandler(log_file))
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        handlers=handlers,
        force=True,
    )

    wandb_run = None
    if project:
        try:
            import wandb

            wandb_run = wandb.init(
                project=project, name=run_name, id=run_id,
                resume="allow" if run_id else None, config=config or {},
            )
        except Exception as e:  # offline / wandb absent
            logging.getLogger(__name__).warning(
                "wandb unavailable (%s); metrics go to the log only", e)

    def log_metrics(metrics: Dict, step: Optional[int] = None):
        logging.getLogger("metrics").info(
            "%s", json.dumps({**metrics, **({"step": step} if step is not None else {})}))
        if wandb_run is not None:
            wandb_run.log(metrics, step=step)

    return log_metrics


def log_metrics(metrics: Dict, step: Optional[int] = None):
    """Module-level fallback logger (no W&B)."""
    logging.getLogger("metrics").info("%s", json.dumps(metrics))


# Grid sweeps per model x task (the reference's sweep_config.py dicts,
# reduced to the hyperparameters our drivers consume).
SWEEP_CONFIGS: Dict[str, Dict] = {
    "mobilebert_glue": {
        "method": "grid",
        "metric": {"name": "accuracy", "goal": "maximize"},
        "parameters": {
            "learning_rate": {"values": [1e-5, 3e-5, 5e-5, 1e-4]},
            "num_train_epochs": {"values": [3, 5, 10]},
            "seed": {"values": [0, 1, 2]},
        },
    },
    "bert_squad": {
        "method": "grid",
        "metric": {"name": "f1", "goal": "maximize"},
        "parameters": {
            "learning_rate": {"values": [3e-5, 5e-5]},
            "num_train_epochs": {"values": [2, 3]},
            "seed": {"values": [0, 1, 2]},
        },
    },
    "llama_wikitext": {
        "method": "grid",
        "metric": {"name": "perplexity", "goal": "minimize"},
        "parameters": {
            "activation": {"values": ["posit8_1", "posit8_2", "e4m3"]},
            "quantize_forward": {"values": [
                "gemm,activation,layernorm,residual,scaling", "gemm"]},
        },
    },
}


def run_sweep(name: str, train_fn: Callable, project: Optional[str] = None):
    """Run a named sweep: via wandb.agent when available, else a local grid."""
    cfg = SWEEP_CONFIGS[name]
    try:
        if project is None:
            raise RuntimeError("no project - local grid")
        import wandb

        sweep_id = wandb.sweep(cfg, project=project)
        wandb.agent(sweep_id, function=train_fn)
        return sweep_id
    except Exception:
        # Local grid fallback: cartesian product over parameters.
        import itertools

        keys = list(cfg["parameters"])
        values = [cfg["parameters"][k]["values"] for k in keys]
        results = []
        for combo in itertools.product(*values):
            params = dict(zip(keys, combo))
            logging.getLogger(__name__).info("sweep point: %s", params)
            results.append((params, train_fn(**params)))
        return results
