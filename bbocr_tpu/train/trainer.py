"""Training: losses, optimizer state, and the mesh-sharded joint train step.

The reference ships pretrained torch weights via its EasyOCR dependency;
this framework owns training so recognizer/detector weights are reproducible
on TPU. The joint step trains both models under one optimizer, sharded dp
(batch) x tp (wide matmuls) via GSPMD annotations from
``bbocr_tpu.parallel.sharding``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bbocr_tpu.models import CRAFT, CRNN, EN_CHARSET
from bbocr_tpu.models.craft import normalize_image
from bbocr_tpu.parallel.sharding import batch_sharding, param_shardings, replicate_sharding


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 1e-5
    grad_clip: float = 5.0
    # Online hard-negative balance for detector MSE (text pixels are sparse).
    detector_neg_ratio: float = 3.0
    # LR schedule: "constant" or "cosine" (linear warmup -> cosine decay to
    # learning_rate * final_lr_frac over total_steps).
    schedule: str = "constant"
    warmup_steps: int = 0
    total_steps: int = 0
    final_lr_frac: float = 0.05


class TrainState(NamedTuple):
    step: jnp.ndarray
    craft_params: Any
    crnn_params: Any
    opt_state: Any


def make_schedule(config: TrainConfig):
    """LR schedule per config: constant, warmup-only, or warmup+cosine."""
    if config.schedule == "cosine":
        if config.total_steps <= 0:
            raise ValueError("cosine schedule requires total_steps > 0")
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if config.warmup_steps > 0 else config.learning_rate,
            peak_value=config.learning_rate,
            warmup_steps=max(config.warmup_steps, 1),
            decay_steps=config.total_steps,
            end_value=config.learning_rate * config.final_lr_frac,
        )
    if config.warmup_steps > 0:
        return optax.linear_schedule(
            init_value=0.0,
            end_value=config.learning_rate,
            transition_steps=config.warmup_steps,
        )
    return config.learning_rate


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.adamw(make_schedule(config), weight_decay=config.weight_decay),
    )


def crnn_loss(crnn: CRNN, params, crops, labels, label_lens, frame_lens) -> jnp.ndarray:
    """CTC loss on (B, 32, W) crops in [0,255] (any dtype; u8 on the wire —
    4x less host->device traffic per step, which bounds step rate on
    relayed TPU links)."""
    x = (crops.astype(jnp.float32) / 127.5 - 1.0)[..., None]
    logits = crnn.apply(params, x)  # (B, T, C)
    b, t, _ = logits.shape
    frame_idx = jnp.arange(t)[None, :]
    logit_pad = (frame_idx >= frame_lens[:, None]).astype(jnp.float32)
    label_idx = jnp.arange(labels.shape[1])[None, :]
    label_pad = (label_idx >= label_lens[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_pad, labels, label_pad)
    norm = jnp.maximum(label_lens.astype(jnp.float32), 1.0)
    return jnp.mean(per_seq / norm)


def craft_loss(craft: CRAFT, params, pages, target_maps, neg_ratio: float = 3.0) -> jnp.ndarray:
    """Balanced MSE on region/affinity heatmaps.

    ``pages``: (B, H, W) gray [0,255]; targets (B, H/2, W/2, 2) in [0,1].
    """
    rgb01 = jnp.repeat(pages.astype(jnp.float32)[..., None], 3, axis=-1) / 255.0
    if target_maps.dtype == jnp.uint8:  # u8-quantized heatmaps on the wire
        target_maps = target_maps.astype(jnp.float32) / 255.0
    else:
        target_maps = target_maps.astype(jnp.float32)
    pred = craft.apply(params, normalize_image(rgb01))
    err = (pred - target_maps) ** 2
    pos = (target_maps > 0.1).astype(jnp.float32)
    n_pos = jnp.maximum(pos.sum(), 1.0)
    pos_loss = (err * pos).sum() / n_pos
    # hardest negatives: mean of top-k errors approximated by weighting
    neg = 1.0 - pos
    n_neg = jnp.maximum(neg.sum(), 1.0)
    neg_loss = (err * neg).sum() / n_neg
    return pos_loss + neg_ratio * neg_loss


def create_train_state(
    seed: int = 0,
    config: TrainConfig = TrainConfig(),
    charset=EN_CHARSET,
    dtype=jnp.bfloat16,
) -> Tuple[TrainState, CRAFT, CRNN, optax.GradientTransformation]:
    craft = CRAFT(dtype=dtype)
    crnn = CRNN(num_classes=charset.num_classes, dtype=dtype)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    craft_params = craft.init(k1, jnp.zeros((1, 64, 64, 3), jnp.float32))
    crnn_params = crnn.init(k2, jnp.zeros((1, 32, 64, 1), jnp.float32))
    tx = make_optimizer(config)
    opt_state = tx.init((craft_params, crnn_params))
    state = TrainState(jnp.zeros((), jnp.int32), craft_params, crnn_params, opt_state)
    return state, craft, crnn, tx


def make_crnn_train_step(crnn: CRNN, tx: optax.GradientTransformation, mesh: Optional[Mesh] = None):
    """(params, opt_state, batch) -> (params, opt_state, loss) for the
    recognizer alone. One compiled program per crop-width bucket."""

    def step(params, opt_state, crops, labels, label_lens, frame_lens):
        def loss_fn(p):
            return crnn_loss(crnn, p, crops, labels, label_lens, frame_lens)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))
    repl = replicate_sharding(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, repl, bsh, bsh, bsh, bsh),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


def make_craft_train_step(
    craft: CRAFT, tx: optax.GradientTransformation, mesh: Optional[Mesh] = None,
    neg_ratio: float = 3.0,
):
    def step(params, opt_state, pages, maps):
        def loss_fn(p):
            return craft_loss(craft, p, pages, maps, neg_ratio)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))
    repl = replicate_sharding(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, repl, bsh, bsh),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


def vlm_loss(model, params, pages, tokens, tok_lens) -> jnp.ndarray:
    """Next-token cross-entropy for the PageReader head (BASELINE config 5).

    ``pages`` (B, H, W) uint8-ish gray in [0,255]; ``tokens`` (B, L) padded
    BOS..EOS sequences; loss masks PAD positions.
    """
    logits = model.apply(params, pages.astype(jnp.float32)[..., None], tokens[:, :-1])
    targets = tokens[:, 1:]
    mask = (jnp.arange(targets.shape[1])[None, :] < (tok_lens - 1)[:, None]).astype(
        jnp.float32
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def vlm_ctc_aux_loss(model, params, pages, char_labels, char_lens) -> jnp.ndarray:
    """CTC over the row-major encoder token grid vs the page transcription.

    Round-2 VERDICT #6 grounding fix: at d=192 the decoder's cross-attention
    does not discover reading from the JSON/transcription CE alone; this
    loss makes every encoder token linearly decodable into the character it
    sits on, the same signal the CRNN trains with."""
    _, ctc_logits = model.apply(
        params, pages.astype(jnp.float32)[..., None], method="encode_ctc"
    )
    b, t, _ = ctc_logits.shape
    logit_pad = jnp.zeros((b, t), jnp.float32)  # every grid token is a frame
    label_idx = jnp.arange(char_labels.shape[1])[None, :]
    label_pad = (label_idx >= char_lens[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(ctc_logits, logit_pad, char_labels, label_pad)
    return jnp.mean(per_seq / jnp.maximum(char_lens.astype(jnp.float32), 1.0))


def make_vlm_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    ctc_weight: float = 0.0,
):
    """``ctc_weight`` > 0 adds the encoder CTC auxiliary loss; the step then
    takes two extra batch arrays (char_labels (B, Lc), char_lens (B,))."""

    def step(params, opt_state, pages, tokens, tok_lens, *ctc_batch):
        def loss_fn(p):
            ce = vlm_loss(model, p, pages, tokens, tok_lens)
            if ctc_weight > 0.0:
                ce = ce + ctc_weight * vlm_ctc_aux_loss(model, p, pages, *ctc_batch)
            return ce

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    n_in = 5 + (2 if ctc_weight > 0.0 else 0)
    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))
    repl = replicate_sharding(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, repl) + (bsh,) * (n_in - 2),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


def make_joint_train_step(
    craft: CRAFT,
    crnn: CRNN,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    config: TrainConfig = TrainConfig(),
    state_example: Optional[TrainState] = None,
):
    """Jitted (state, batch) -> (state, metrics) step, optionally mesh-sharded.

    ``batch``: dict with pages (B,H,W), maps (B,H/2,W/2,2), crops (B2,32,W2),
    labels (B2,L), label_lens (B2,), frame_lens (B2,).

    With a mesh, pass ``state_example`` (for sharding-tree construction);
    inputs get batch-sharded over ``dp``, large kernels over ``tp``.
    """

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        def loss_fn(both):
            cp, rp = both
            l_det = craft_loss(craft, cp, batch["pages"], batch["maps"], config.detector_neg_ratio)
            l_rec = crnn_loss(
                crnn, rp, batch["crops"], batch["labels"], batch["label_lens"], batch["frame_lens"]
            )
            return l_det + l_rec, {"loss_det": l_det, "loss_rec": l_rec}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (state.craft_params, state.crnn_params)
        )
        updates, new_opt = tx.update(
            grads, state.opt_state, (state.craft_params, state.crnn_params)
        )
        new_craft, new_crnn = optax.apply_updates(
            (state.craft_params, state.crnn_params), updates
        )
        metrics = dict(metrics, loss=loss)
        return TrainState(state.step + 1, new_craft, new_crnn, new_opt), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    if state_example is None:
        raise ValueError("state_example is required when sharding over a mesh")

    repl = replicate_sharding(mesh)
    bsh = batch_sharding(mesh)
    cp_sh = param_shardings(state_example.craft_params, mesh)
    rp_sh = param_shardings(state_example.crnn_params, mesh)
    opt_sh = _shard_opt_like(state_example.opt_state, (cp_sh, rp_sh), mesh)
    in_state_sh = TrainState(repl, cp_sh, rp_sh, opt_sh)
    batch_sh = {
        "pages": bsh, "maps": bsh, "crops": bsh, "labels": bsh,
        "label_lens": bsh, "frame_lens": bsh,
    }
    metrics_sh = {"loss": repl, "loss_det": repl, "loss_rec": repl}
    return jax.jit(
        step,
        in_shardings=(in_state_sh, batch_sh),
        out_shardings=(in_state_sh, metrics_sh),
        donate_argnums=(0,),
    )


def _shard_opt_like(opt_state: Any, param_sh: Any, mesh: Mesh) -> Any:
    """Optimizer-state shardings: leaves whose tree path ends with a
    parameter path (adam mu/nu mirror the param tree) inherit that param's
    sharding; everything else (step counters, clip state) replicates."""
    repl = NamedSharding(mesh, P())
    flat_param_sh = {
        tuple(str(k) for k in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(param_sh)[0]
    }

    def rule(path, leaf):
        key = tuple(str(k) for k in path)
        for pk, sh in flat_param_sh.items():
            if len(key) >= len(pk) and key[-len(pk):] == pk:
                return sh
        return repl

    return jax.tree_util.tree_map_with_path(rule, opt_state)
