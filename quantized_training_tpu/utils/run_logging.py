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


# Grid sweeps per model x task — the reference's full sweep_config.py
# matrix (reference sweep_config.py:1-207), same names and constants.
# ``learning_rate`` min/max are integer mantissas of 1e-4 steps (the
# reference's launcher multiplies; its HYPERPARAMETERS table stores the
# winners as e.g. 12e-4); the local-grid runner in :func:`run_sweep`
# expands {min,max} integer ranges, {value} singletons, and {values} lists.
def _grid(metric: str, bs, epochs, lr_lo: int, lr_hi: int,
          name: str) -> Dict:
    def _span(v):
        return ({"value": v} if not isinstance(v, tuple)
                else {"min": v[0], "max": v[1]})
    return {
        "method": "grid",
        "name": name,
        "metric": {"goal": "maximize", "name": metric},
        "parameters": {
            "per_device_train_batch_size": _span(bs),
            "num_train_epochs": _span(epochs),
            "learning_rate": {"min": lr_lo, "max": lr_hi},
        },
    }


_ACC = "accuracy"
SWEEP_CONFIGS: Dict[str, Dict] = {
    # MobileBERT (reference sweep_config.py:5-60)
    "mobilebert_mnli_lora_bf16": _grid(_ACC, 16, 30, 5, 14,
                                       "mnli_hyperparameter_sweep"),
    "mobilebert_qnli_lora_bf16": _grid(_ACC, 16, 50, 5, 14,
                                       "qnli_hyperparameter_sweep"),
    "mobilebert_mrpc_lora_bf16": _grid(_ACC, 16, 30, 5, 14,
                                       "mrpc_hyperparameter_sweep"),
    "mobilebert_sst2_lora_bf16": _grid(_ACC, 16, 60, 5, 14,
                                       "sst2_hyperparameter_sweep"),
    "mobilebert_squad_lora_bf16": _grid("f1", 16, 30, 5, 14,
                                        "squad_hyperparameter_sweep"),
    # RoBERTa base (:62-116; the reference defines the sst2 grid under a
    # duplicated mrpc key — kept under its intended name here)
    "roberta_base_mnli_lora_bf16": _grid(_ACC, 16, 30, 5, 9,
                                         "mnli_hyperparameter_sweep"),
    "roberta_base_qnli_lora_bf16": _grid(_ACC, 32, 25, 4, 8,
                                         "qnli_hyperparameter_sweep"),
    "roberta_base_mrpc_lora_bf16": _grid(_ACC, 16, 30, 5, 9,
                                         "mrpc_hyperparameter_sweep"),
    "roberta_base_sst2_lora_bf16": _grid(_ACC, 16, 60, 5, 9,
                                         "sst2_hyperparameter_sweep"),
    "roberta_base_squad_lora_bf16": _grid("f1", 16, 30, 5, 9,
                                          "squad_hyperparameter_sweep"),
    # RoBERTa large (:119-173)
    "roberta_large_mnli_lora_bf16": _grid(_ACC, 4, 10, 3, 7,
                                          "mnli_hyperparameter_sweep"),
    "roberta_large_qnli_lora_bf16": _grid(_ACC, 4, 10, 2, 6,
                                          "qnli_hyperparameter_sweep"),
    "roberta_large_mrpc_lora_bf16": _grid(_ACC, 4, 20, 3, 7,
                                          "mrpc_hyperparameter_sweep"),
    "roberta_large_sst2_lora_bf16": _grid(_ACC, 4, 10, 4, 8,
                                          "sst2_hyperparameter_sweep"),
    "roberta_large_squad_lora_bf16": _grid("f1", 4, 10, 5, 9,
                                           "squad_hyperparameter_sweep"),
    # MINOTAUR (:176-207)
    "mobilebert_tiny_mrpc_sgd_lora_bf16": _grid(_ACC, 16, 30, 6, 15,
                                                "mrpc_lora_sweep_step_lr"),
    "mobilebert_tiny_squad_bf16": _grid(_ACC, 16, (3, 7), 1, 5,
                                        "squad_sweep"),
    "bert_base_squad_posit8": _grid(_ACC, 16, (3, 7), 5, 9,
                                    "squad_sweep"),
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
        # Accepts the three W&B grid forms: {values: [...]}, {value: x},
        # and integer {min, max} ranges (inclusive).
        import itertools

        def _expand(p):
            if "values" in p:
                return list(p["values"])
            if "value" in p:
                return [p["value"]]
            return list(range(p["min"], p["max"] + 1))

        keys = list(cfg["parameters"])
        values = [_expand(cfg["parameters"][k]) for k in keys]
        results = []
        for combo in itertools.product(*values):
            params = dict(zip(keys, combo))
            logging.getLogger(__name__).info("sweep point: %s", params)
            results.append((params, train_fn(**params)))
        return results
