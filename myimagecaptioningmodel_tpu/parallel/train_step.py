"""The jitted training / decode steps, sharded over the device mesh.

One compiled executable covers forward (CNN + 34-step ``lax.scan``
recurrence), backward, gradient AllReduce (GSPMD-inserted ``psum`` over ICI
when the batch is sharded) and the Adam update — the same
"everything-in-one-program" shape as the reference's ParallelExecutor step
(SURVEY §3.1), minus the per-run Python overhead.

BatchNorm note: batch statistics under a sharded batch are *global* batch
stats (jnp.mean over a sharded axis is semantically global; XLA inserts the
cross-device reduction), which is stronger than the reference's per-GPU-
replica BN stats — documented divergence in favor of correctness.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from myimagecaptioningmodel_tpu.models import captioner
from myimagecaptioningmodel_tpu.models.captioner import ModelOptions
from myimagecaptioningmodel_tpu.parallel import mesh as mesh_mod


class EmaState(NamedTuple):
    """State of the params-EMA tracker: the averaged params pytree."""

    ema: dict


def params_ema_tracker(decay: float) -> optax.GradientTransformation:
    """An optax transform that shadows an exponential moving average of the
    PARAMS (not the updates): ``ema = decay*ema + (1-decay)*(params+updates)``.

    Chain it LAST (after clip/Adam) so it sees the final updates. Because
    the EMA tree mirrors the param tree verbatim inside the optimizer state,
    checkpointing, mid-epoch resume, donation, and the vocab-TP shardings
    (parallel/mesh.opt_state_shardings matches moments by tree-path suffix)
    all apply to it with zero extra plumbing. Updates pass through unchanged.
    """

    def init_fn(params):
        # REAL copies, not jnp.asarray aliases: the train step donates params
        # and opt_state in the same call — shared buffers would be donated
        # twice (XLA INVALID_ARGUMENT)
        return EmaState(
            ema=jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params)
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("params_ema_tracker requires params")
        new_ema = jax.tree_util.tree_map(
            lambda e, p, u: decay * e + (1.0 - decay) * (p + u),
            state.ema, params, updates,
        )
        return updates, EmaState(ema=new_ema)

    return optax.GradientTransformation(init_fn, update_fn)


def ema_params_from_opt_state(opt_state):
    """Extract the EMA params tree from an arbitrarily nested optimizer state
    (chains within chains, MultiSteps wrappers, ...); None when absent."""
    if isinstance(opt_state, EmaState):
        return opt_state.ema
    if isinstance(opt_state, (tuple, list)):
        for s in opt_state:
            found = ema_params_from_opt_state(s)
            if found is not None:
                return found
    return None


def make_optimizer(cfg, schedule) -> optax.GradientTransformation:
    """Adam + optional by-value clip (reference train.py:26-31,42-43) +
    optional params-EMA tracker (rebuild-only, cfg.train.ema_decay)."""
    tx = optax.adam(learning_rate=schedule)
    clip = cfg.train.gradient_clip
    if clip:
        tx = optax.chain(optax.clip(float(clip)), tx)
    ema = float(getattr(cfg.train, "ema_decay", 0.0) or 0.0)
    if ema > 0.0:
        tx = optax.chain(tx, params_ema_tracker(ema))
    return tx


class TrainStepFns(NamedTuple):
    train_step: Callable  # (params, opt_state, model_state, step, imgs, caps) -> (params, opt_state, model_state, step, loss, lr)
    decode_step: Callable  # (params, model_state, imgs) -> ids


def build_steps(
    opts: ModelOptions,
    optimizer: optax.GradientTransformation,
    schedule,
    mesh=None,
    donate: bool = True,
    params_sharding=None,
    opt_sharding=None,
    grad_accum_steps: int = 1,
) -> TrainStepFns:
    """Compile-ready train/decode steps.

    With a mesh, batch args are sharded over the ``data`` axis; params/opt
    state follow ``params_sharding``/``opt_sharding`` (pytrees of
    NamedShardings from ``mesh_mod.param_shardings`` — replicated by default,
    vocab-head tensors sharded over the ``model`` axis under TP).

    ``grad_accum_steps > 1`` runs the forward/backward over N sequential
    microbatches (a ``lax.scan``, so ONE compiled program still) and applies
    a single Adam update on the averaged gradients — the standard recipe
    when the full batch's activations exceed HBM. BN statistics are
    per-microbatch; the BN state threads through the scan."""

    if mesh is not None and mesh.shape.get(mesh_mod.MODEL_AXIS, 1) > 1:
        # under vocab-TP: the fused Pallas greedy head assumes an unsharded
        # embedding table -> use the GSPMD head; and grouped-conv gradients
        # miscompile under partial batch sharding -> taps-form depthwise
        opts = opts._replace(use_pallas=False, safe_depthwise=True)

    def grad_fn(params, model_state, images, captions):
        def lf(p):
            return captioner.loss_fn(p, model_state, images, captions, opts, True)

        return jax.value_and_grad(lf, has_aux=True)(params)

    def train_step(params, opt_state, model_state, step, images, captions):
        if grad_accum_steps > 1:
            # Accumulate the gradient of the masked-CE SUM per microbatch and
            # divide by the GLOBAL token count — exactly the whole-batch
            # token-mean objective. (Averaging per-microbatch token-MEANS
            # would over-weight microbatches holding short captions.)
            a = grad_accum_steps
            micro_imgs = images.reshape(a, images.shape[0] // a, *images.shape[1:])
            micro_caps = captions.reshape(a, captions.shape[0] // a, *captions.shape[1:])

            def sum_fn(p, mstate, im, cp):
                ce_sum, n_tok, ns = captioner.loss_terms(
                    p, mstate, im, cp, opts, True
                )
                return ce_sum, (n_tok, ns)

            def micro(carry, xs):
                g_acc, ce_acc, tok_acc, mstate = carry
                im, cp = xs
                if mesh is not None:
                    # Pin each microbatch back to leading-axis data sharding:
                    # the [B] -> [a, B/a] reshape leaves the sharded rows on
                    # axis 1, a partitioning regime where XLA's SPMD gradients
                    # diverge from the single-device program (measured ~1-4%
                    # early-conv grad error on a (data=4) CPU mesh; exact
                    # once constrained — tests/test_train_features.py).
                    bsh = mesh_mod.batch_sharding(mesh)
                    im = jax.lax.with_sharding_constraint(im, bsh)
                    cp = jax.lax.with_sharding_constraint(cp, bsh)
                (ce_sum, (n_tok, ns)), g = jax.value_and_grad(
                    sum_fn, has_aux=True
                )(params, mstate, im, cp)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, ce_acc + ce_sum, tok_acc + n_tok, ns), None

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params
            )
            (g_sum, ce_total, tok_total, new_model_state), _ = jax.lax.scan(
                micro,
                (zeros, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
                 model_state),
                (micro_imgs, micro_caps),
            )
            denom = jnp.maximum(tok_total, 1.0)
            grads = jax.tree_util.tree_map(lambda g: g / denom, g_sum)
            loss = ce_total / denom
        else:
            (loss, new_model_state), grads = grad_fn(
                params, model_state, images, captions
            )
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        lr = schedule(step)
        return new_params, new_opt_state, new_model_state, step + 1, loss, lr

    def decode_step(params, model_state, images):
        return captioner.greedy_decode(params, model_state, images, opts)

    if mesh is None:
        jit_train = jax.jit(train_step, donate_argnums=(0, 1, 2, 3) if donate else ())
        jit_decode = jax.jit(decode_step)
    else:
        repl = mesh_mod.replicated(mesh)
        batch = mesh_mod.batch_sharding(mesh)
        p_sh = params_sharding if params_sharding is not None else repl
        o_sh = opt_sharding if opt_sharding is not None else repl
        jit_train = jax.jit(
            train_step,
            in_shardings=(p_sh, o_sh, repl, repl, batch, batch),
            out_shardings=(p_sh, o_sh, repl, repl, repl, repl),
            donate_argnums=(0, 1, 2, 3) if donate else (),
        )
        jit_decode = jax.jit(
            decode_step,
            in_shardings=(p_sh, repl, batch),
            out_shardings=batch,
        )
    return TrainStepFns(jit_train, jit_decode)
