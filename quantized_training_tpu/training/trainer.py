"""Training loop primitives: jitted QAT train steps with explicit state.

The reference trains with stateful torch modules + backward hooks
(reference: examples/question_answering/run_qa_no_trainer.py); here a train
step is one pure function over an explicit :class:`TrainState` pytree —
params, optimizer state, and fake-quant observer state all thread through
jit/pjit, so the same step runs single-chip or sharded over a mesh
(parallel/sharding.py).

Gradient ("error") quantization is already woven into the model via
bwd_quantize (models/layers.py), so the step builder only needs the loss.
"""

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "TrainState",
    "make_train_step",
    "causal_lm_loss",
    "qa_loss",
    "classification_loss",
    "save_checkpoint",
    "restore_checkpoint",
]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    quant_state: Any          # observer state ({} when not quantizing)
    step: jax.Array

    @staticmethod
    def create(model, variables, tx):
        params = variables["params"]
        return TrainState(
            params=params,
            opt_state=tx.init(params),
            quant_state=variables.get("quant_state", {}),
            step=jnp.zeros((), jnp.int32),
        )


def causal_lm_loss(logits, batch):
    """Next-token cross entropy; batch needs input_ids and optional
    attention_mask (padding)."""
    labels = batch["input_ids"][:, 1:]
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1).squeeze(-1)
    mask = batch.get("attention_mask")
    if mask is not None:
        m = mask[:, 1:].astype(jnp.float32)
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(nll)


def qa_loss(outputs, batch):
    """SQuAD loss: mean CE of start and end positions."""
    start_logits, end_logits = outputs
    def ce(logits, pos):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, pos[:, None], axis=-1))
    return 0.5 * (ce(start_logits, batch["start_positions"])
                  + ce(end_logits, batch["end_positions"]))


def classification_loss(logits, batch):
    labels = batch["labels"]
    if logits.shape[-1] == 1:  # regression (STS-B)
        return jnp.mean(jnp.square(logits.squeeze(-1) - labels))
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Callable,
    model_inputs: Callable = None,
):
    """Build a jitted train step: (state, batch) -> (state, loss).

    ``model_inputs(batch)`` maps a batch dict to the model's positional
    args (default: input_ids [+ attention_mask]).
    """
    if model_inputs is None:
        def model_inputs(batch):
            args = (batch["input_ids"],)
            if "attention_mask" in batch:
                args += (batch["attention_mask"],)
            if "token_type_ids" in batch:
                args += (batch["token_type_ids"],)
            return args

    def compute_loss(params, quant_state, batch):
        variables = {"params": params}
        if quant_state:
            variables["quant_state"] = quant_state
        out = model.apply(
            variables, *model_inputs(batch),
            mutable=["quant_state"] if quant_state else [],
        )
        if isinstance(out, tuple) and len(out) == 2 and isinstance(out[1], dict):
            outputs, updated = out
            new_qs = updated.get("quant_state", quant_state)
        else:
            outputs, new_qs = out, quant_state
        return loss_fn(outputs, batch), new_qs

    @jax.jit
    def train_step(state: TrainState, batch):
        (loss, new_qs), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params, state.quant_state, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, new_qs, state.step + 1), loss

    return train_step


# ---------------------------------------------------------------------------
# Checkpointing (orbax; replaces the reference's checkpoint.tar,
# run_qa_no_trainer.py:961-990)
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state: TrainState, extra: Optional[dict] = None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {"params": state.params, "opt_state": state.opt_state,
               "quant_state": state.quant_state,
               "step": state.step}
    if extra:
        payload["extra"] = extra
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, state: TrainState):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    template = {"params": state.params, "opt_state": state.opt_state,
                "quant_state": state.quant_state, "step": state.step}
    restored = ckptr.restore(path, template)
    return TrainState(restored["params"], restored["opt_state"],
                      restored["quant_state"], restored["step"])
