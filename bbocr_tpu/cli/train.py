"""Training CLI: synthetic-data training for the recognizer and detector.

    python -m bbocr_tpu.cli.train --component crnn --steps 3000 --batch 128
    python -m bbocr_tpu.cli.train --component craft --steps 1500 --batch 16

Host data generation runs in a thread pool feeding a prefetch queue so the
TPU never waits on PIL rasterization; steps are donated-buffer jit calls.
Checkpoints land in --out (default ./checkpoints) as flat .npz, which the
serving engine picks up via BB_OCR_CKPT_DIR or the default path.
"""

from __future__ import annotations

import argparse
import os
import queue
import signal
import threading
import time

import numpy as np

# Graceful-stop flag: SIGTERM requests "save and exit at the next step
# boundary". SIGKILLing a training client mid-compile has poisoned the
# remote compiler on relayed TPU links for hours (docs/ROADMAP.md round-3
# log); drivers should `timeout --signal=TERM --kill-after=...` and let the
# loop finish its in-flight step, checkpoint, and exit.
_STOP_REQUESTED = threading.Event()


def _install_sigterm_handler() -> None:
    owner_pid = os.getpid()

    def _handler(signum, frame):
        if os.getpid() != owner_pid:
            # forked data worker: terminate() means die NOW, not "finish
            # the step" — the inherited handler must not swallow it
            os._exit(0)
        _STOP_REQUESTED.set()
        print("SIGTERM: finishing current step, saving, exiting", flush=True)

    try:
        signal.signal(signal.SIGTERM, _handler)
    except ValueError:
        pass  # non-main thread (library use)


def _warm_backend() -> None:
    """Force full backend init + one compile before any fork (see _prefetch)."""
    import jax
    import jax.numpy as jnp

    from bbocr_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()
    x = jnp.ones((8, 8))
    # host readback, NOT block_until_ready: the relayed backend's
    # block_until_ready returns before the compile actually lands
    float((x @ x).sum())


def _prefetch(make_batch, n_threads: int = 4, depth: int = 8):
    """Host-side batch prefetch into a bounded queue.

    Generation is pure-Python PIL/numpy and GIL-bound, so threads cap out
    at ~one core — with photo-realistic augmentation that starves the chip
    (measured: 470 -> 105 crops/s after the art-background upgrade). Fork
    worker PROCESSES instead (the closure crosses fork fine on Linux;
    children touch only numpy/PIL, never jax). Threads remain as the
    fallback for non-fork platforms.

    Fork ORDER matters, and the safe order is backend-specific. On this
    machine's relayed-TPU backend the parent's FIRST XLA compile deadlocks
    forever if any forked child already exists (measured: a bare sleeping
    child forked before ``import jax`` wedges `(x@x).sum()`; forked after a
    completed compile, everything works). So: fully initialize the backend
    (one tiny compile) BEFORE starting workers — ``_warm_backend`` below —
    then fork. Children only touch numpy/PIL, never jax, so the inherited
    runtime threads are inert in them.
    """
    _warm_backend()
    stop = threading.Event()
    try:
        import multiprocessing as mp

        ctx = mp.get_context("fork")
    except ValueError:
        ctx = None
    if ctx is not None:
        mq = ctx.Queue(maxsize=depth)

        def pworker(seed):
            rng = np.random.default_rng(seed)
            while True:
                mq.put(make_batch(int(rng.integers(0, 1 << 31))))

        procs = [
            ctx.Process(target=pworker, args=(i * 7919 + 13,), daemon=True)
            for i in range(n_threads)
        ]
        for p in procs:
            p.start()

        class _Stop:
            def set(self):
                # Do NOT read mq here: a worker killed mid-put leaves a
                # truncated frame in the pipe, and any subsequent get()
                # blocks forever in recv (observed as a post-save hang).
                # The parent is about to force-exit (main() ends with
                # os._exit), so just SIGKILL the workers — bypassing the
                # SIGTERM handler — and never touch the queue again.
                for p in procs:
                    try:
                        p.kill()
                    except Exception:
                        pass
                try:
                    mq.cancel_join_thread()
                except Exception:
                    pass

        return mq, _Stop()

    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def worker(seed):
        rng = np.random.default_rng(seed)
        while not stop.is_set():
            batch = make_batch(int(rng.integers(0, 1 << 31)))
            try:
                q.put(batch, timeout=1.0)
            except queue.Full:
                continue

    threads = [threading.Thread(target=worker, args=(i,), daemon=True) for i in range(n_threads)]
    for t in threads:
        t.start()
    return q, stop


def _train_config(args):
    from bbocr_tpu.train import TrainConfig

    return TrainConfig(
        learning_rate=args.lr,
        schedule=args.schedule,
        warmup_steps=args.warmup,
        total_steps=args.steps,
    )


def _maybe_resume(args, params, opt_state):
    """Restore (params, opt_state, step) from --state-dir if a checkpoint
    exists there; otherwise pass through with step 0."""
    if not args.state_dir:
        return params, opt_state, 0
    import jax
    import jax.numpy as jnp

    from bbocr_tpu.utils.train_ckpt import latest_checkpoint, restore_train_state

    path = latest_checkpoint(args.state_dir)
    if path is None:
        return params, opt_state, 0
    example = {
        "step": 0,
        "params": jax.device_get(params),
        "opt_state": jax.device_get(opt_state),
    }
    restored = restore_train_state(path, example)
    params = jax.tree_util.tree_map(jnp.asarray, restored["params"])
    opt_state = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if hasattr(x, "shape") else x, restored["opt_state"]
    )
    start = int(restored["step"])
    print(f"resumed from {path} at step {start}", flush=True)
    return params, opt_state, start


def _maybe_save_state(args, step, params, opt_state):
    if not args.state_dir:
        return
    import jax

    from bbocr_tpu.utils.train_ckpt import save_train_state

    save_train_state(
        args.state_dir,
        {"step": step, "params": jax.device_get(params), "opt_state": jax.device_get(opt_state)},
        step=step,
    )


def _load_real_val(dir_path: str, max_width: int):
    """Load harvested real crops (see cli/harvest_real_crops.py) into one
    padded (N_padded, 32, max_width) u8 array + N reference labels. Crops
    wider than max_width are aspect-squeezed like the engine's top bucket;
    batch rows are padded to a multiple of 64 to bound jit shapes (labels
    are NOT padded — callers decode only the first N rows)."""
    import json as _json

    from PIL import Image

    with open(os.path.join(dir_path, "labels.json")) as f:
        meta = _json.load(f)
    names = sorted(meta)
    refs, crops = [], []
    for name in names:
        img = Image.open(os.path.join(dir_path, name)).convert("L")
        if img.height != 32:
            img = img.resize((max(8, round(img.width * 32 / img.height)), 32), Image.BILINEAR)
        if img.width > max_width:
            img = img.resize((max_width, 32), Image.BILINEAR)
        a = np.asarray(img, np.float32)
        row = np.empty((32, max_width), np.float32)
        row[:, : a.shape[1]] = a
        row[:, a.shape[1] :] = a[:, -1:]
        crops.append(row)
        entry = meta[name]
        refs.append(entry["label"] if isinstance(entry, dict) else str(entry))
    n = len(crops)
    padded = ((n + 63) // 64) * 64
    out = np.zeros((padded, 32, max_width), np.float32)
    if n:
        out[:n] = np.stack(crops)
    return out, refs


def _load_pipeline_crops(dir_path: str):
    """Load pipeline-consistent crops (cli/make_pipeline_crops.py) as
    [(u8 (32, w) array, label str)]. Loaded in the parent BEFORE the
    prefetch fork so workers share the pages via fork COW."""
    import json as _json

    from PIL import Image

    with open(os.path.join(dir_path, "labels.json")) as f:
        meta = _json.load(f)
    out = []
    for name in sorted(meta):
        img = Image.open(os.path.join(dir_path, name)).convert("L")
        if img.height != 32:
            img = img.resize((max(8, round(img.width * 32 / img.height)), 32), Image.BILINEAR)
        entry = meta[name]
        label = entry["label"] if isinstance(entry, dict) else str(entry)
        out.append((np.asarray(img, np.uint8), label))
    return out


def train_crnn(args) -> None:
    import jax
    import jax.numpy as jnp

    from bbocr_tpu.models import CRNN
    from bbocr_tpu.train import TrainConfig, make_optimizer
    from bbocr_tpu.train.trainer import make_crnn_train_step
    from bbocr_tpu.train.synth import SynthConfig, TextLineGenerator
    from bbocr_tpu.utils.cer import corpus_cer
    from bbocr_tpu.utils.checkpoint import save_params
    from bbocr_tpu.decode import ctc_greedy_decode
    from bbocr_tpu.models.charset import CHARSETS

    cfg = SynthConfig(charset=CHARSETS[args.charset])
    if args.charset == "cjk":
        # Refuse to synthesize tofu: the generator renders with the system
        # fonts, and a head trained on missing-glyph boxes is worse than no
        # head. (This image ships DejaVu only — no CJK coverage.)
        from PIL import ImageFont

        from bbocr_tpu.train.synth import _find_fonts

        def covers(path, ch="カ"):  # katakana KA
            try:
                f = ImageFont.truetype(path, 24)
                missing = f.getmask("￿").getbbox()
                got = f.getmask(ch).getbbox()
                return got is not None and got != missing
            except Exception:
                return False

        if not any(covers(p) for p in _find_fonts()):
            raise SystemExit(
                "--charset cjk: no installed font covers CJK glyphs; install "
                "one (e.g. Noto Sans CJK) before training this head"
            )

    widths = [int(w) for w in str(args.width).split(",")]

    pipe_data, pipe_frac = None, 0.0
    if getattr(args, "pipeline_crops", None):
        spec = str(args.pipeline_crops).split(":")
        try:
            pipe_data = _load_pipeline_crops(spec[0])
            pipe_frac = float(spec[1]) if len(spec) > 1 else 0.25
        except (OSError, ValueError, KeyError) as e:
            print(f"pipeline-crops disabled ({args.pipeline_crops}: {e})", flush=True)
        else:
            print(f"pipeline crops: {len(pipe_data)} from {spec[0]} "
                  f"at frac {pipe_frac}", flush=True)
            if not pipe_data:
                pipe_data = None

    def make_batch(seed):
        gen = TextLineGenerator(cfg, seed=seed)
        width = widths[seed % len(widths)]
        crops, labels, label_lens, frame_lens = gen.batch(args.batch, width=width)
        if pipe_data is not None and pipe_frac > 0:
            # Mix in crops that went through the REAL serving pipeline
            # (letterbox -> detect -> CC quads -> rectify): quad growth and
            # warp resampling shift the distribution vs generator renders.
            rng = np.random.default_rng(seed ^ 0x5EED)
            max_chars = max(1, min(cfg.max_label_len, (width // 4 - 2) // 2))
            n_mix = int(args.batch * pipe_frac)
            rows = rng.choice(args.batch, size=n_mix, replace=False)
            for row in rows:
                for _ in range(8):  # find a crop that fits this width bucket
                    img, label = pipe_data[int(rng.integers(len(pipe_data)))]
                    enc = cfg.charset.encode(label)
                    if img.shape[1] <= width and 0 < len(enc) <= max_chars:
                        break
                else:
                    continue
                w_img = img.shape[1]
                crops[row] = 0.0
                crops[row][:, :w_img] = img.astype(np.float32)
                crops[row][:, w_img:] = crops[row][:, w_img - 1 : w_img]
                labels[row] = 0
                labels[row][: len(enc)] = enc
                label_lens[row] = len(enc)
        # u8 on the wire: step rate is upload-bandwidth-bound on relayed
        # TPU links; crnn_loss widens on device.
        return crops.astype(np.uint8), labels, label_lens, frame_lens

    # fork workers BEFORE the first jax computation (model init starts the
    # TPU runtime; forking after that is unsupported by libtpu)
    q, stop = _prefetch(make_batch, n_threads=args.data_threads)

    crnn = CRNN(num_classes=cfg.charset.num_classes)
    params = crnn.init(jax.random.PRNGKey(args.seed), jnp.zeros((1, 32, 64, 1), jnp.float32))
    if args.init_from:
        from bbocr_tpu.utils.checkpoint import load_params

        params = jax.tree_util.tree_map(jnp.asarray, load_params(args.init_from))
        print(f"initialized from {args.init_from}", flush=True)
    tx = make_optimizer(_train_config(args))
    opt_state = tx.init(params)
    params, opt_state, start_step = _maybe_resume(args, params, opt_state)
    step_fn = make_crnn_train_step(crnn, tx)

    # fixed validation set (largest width bucket)
    val_gen = TextLineGenerator(cfg, seed=999_999)
    val_crops, val_labels, val_label_lens, _ = val_gen.batch(64, width=max(widths))
    val_refs = [
        cfg.charset.decode_ids(val_labels[i][: val_label_lens[i]]) for i in range(64)
    ]
    # Real-crop validation (cli/harvest_real_crops.py output): synthetic val
    # CER was 20x better than CER on real rectified crops (round-3 EVAL.md),
    # so the synthetic number alone cannot gate quality work.
    real_crops = real_refs = None
    if getattr(args, "val_real", None):
        try:
            real_crops, real_refs = _load_real_val(args.val_real, max(widths))
            if not real_refs:
                real_crops = real_refs = None
        except (OSError, ValueError, KeyError) as e:
            print(f"val-real disabled ({args.val_real}: {e})", flush=True)
        else:
            print(f"real val: {len(real_refs or [])} crops from {args.val_real}", flush=True)

    @jax.jit
    def predict(p, crops):
        logits = crnn.apply(p, (crops / 127.5 - 1.0)[..., None])
        lengths = jnp.full((crops.shape[0],), logits.shape[1], jnp.int32)
        return ctc_greedy_decode(logits, lengths)

    t0 = time.time()
    losses = []  # device arrays; only synced at log points
    best_real_cer = [float("inf")]
    for step in range(start_step + 1, args.steps + 1):
        crops, labels, label_lens, frame_lens = q.get()
        params, opt_state, loss = step_fn(
            params, opt_state,
            jnp.asarray(crops), jnp.asarray(labels),
            jnp.asarray(label_lens), jnp.asarray(frame_lens),
        )
        losses.append(loss)
        if step % args.log_every == 0 or step == args.steps:
            mean_loss = float(np.mean([float(l) for l in losses]))
            losses = []
            ids, lens, _ = predict(params, jnp.asarray(val_crops))
            ids, lens = np.asarray(ids), np.asarray(lens)
            hyps = [cfg.charset.decode_ids(ids[i][: lens[i]]) for i in range(len(val_refs))]
            val_cer = corpus_cer(val_refs, hyps)
            real_part = ""
            if real_crops is not None:
                rids, rlens, _ = predict(params, jnp.asarray(real_crops))
                rids, rlens = np.asarray(rids), np.asarray(rlens)
                rhyps = [
                    cfg.charset.decode_ids(rids[i][: rlens[i]])
                    for i in range(len(real_refs))
                ]
                real_cer = corpus_cer(real_refs, rhyps)
                real_part = f"real_cer {real_cer:.4f} "
                # Track the real-CER optimum separately: r3d showed the
                # synthetic and real curves DIVERGE (synthetic val improved
                # while covers regressed 10x), so the last checkpoint is not
                # necessarily the shippable one.
                if real_cer < best_real_cer[0]:
                    best_real_cer[0] = real_cer
                    os.makedirs(args.out, exist_ok=True)
                    save_params(
                        os.path.join(args.out, "crnn_best_real.npz"),
                        jax.device_get(params),
                    )
                    with open(os.path.join(args.out, "best_real.json"), "w") as f:
                        import json as _json

                        _json.dump({"step": step, "real_cer": round(real_cer, 5)}, f)
            rate = (step - start_step) * args.batch / (time.time() - t0)
            print(
                f"step {step:6d} loss {mean_loss:8.4f} "
                f"val_cer {val_cer:.4f} {real_part}crops/s {rate:8.1f} "
                f"sample {hyps[0]!r} vs {val_refs[0]!r}",
                flush=True,
            )
        if step % args.save_every == 0 or step == args.steps or _STOP_REQUESTED.is_set():
            os.makedirs(args.out, exist_ok=True)
            name = "crnn.npz" if args.charset == "en" else f"crnn_{args.charset}.npz"
            save_params(os.path.join(args.out, name), jax.device_get(params))
            _maybe_save_state(args, step, params, opt_state)
        if _STOP_REQUESTED.is_set():
            print(f"stopped early at step {step}", flush=True)
            break
    stop.set()
    name = "crnn.npz" if args.charset == "en" else f"crnn_{args.charset}.npz"
    print(f"saved {os.path.join(args.out, name)}")


def train_craft(args) -> None:
    import jax
    import jax.numpy as jnp

    from bbocr_tpu.models import CRAFT, CRAFTLite
    from bbocr_tpu.train import TrainConfig, make_optimizer
    from bbocr_tpu.train.trainer import make_craft_train_step
    from bbocr_tpu.train.synth import PageGenerator, SynthConfig
    from bbocr_tpu.utils.checkpoint import save_params

    # Page-size menu (comma lists): covers letterboxed to serving canvases
    # carry display glyphs up to ~180px — training only at 256x192 (glyphs
    # <= 64px) left the detector blind to the large-glyph regime (round-2
    # diag: merged multi-line quads on real covers). Each size compiles its
    # own train step; keep the menu to 2-3 entries.
    hs = [int(x) for x in str(args.page_h).split(",")]
    ws = [int(x) for x in str(args.page_w).split(",")]
    if len(hs) != len(ws):
        raise SystemExit("--page-h and --page-w lists must have equal length")

    def make_batch(seed):
        gen = PageGenerator(SynthConfig(), seed=seed)
        k = seed % len(hs)
        pages, maps = gen.batch(args.batch, hs[k], ws[k])
        # u8 pages + u8-quantized heatmaps: 4x less relay upload per step
        # (craft_loss dequantizes on device).
        return pages.astype(np.uint8), np.round(maps * 255.0).astype(np.uint8)

    # fork workers BEFORE the first jax computation (see _prefetch)
    q, stop = _prefetch(make_batch, n_threads=args.data_threads)

    craft = CRAFTLite() if getattr(args, "arch", "vgg") == "lite" else CRAFT()
    params = craft.init(jax.random.PRNGKey(args.seed), jnp.zeros((1, 64, 64, 3), jnp.float32))
    if args.init_from:
        from bbocr_tpu.utils.checkpoint import load_params

        params = jax.tree_util.tree_map(jnp.asarray, load_params(args.init_from))
        print(f"initialized from {args.init_from}", flush=True)
    tx = make_optimizer(_train_config(args))
    opt_state = tx.init(params)
    params, opt_state, start_step = _maybe_resume(args, params, opt_state)
    step_fn = make_craft_train_step(craft, tx, neg_ratio=args.neg_ratio)

    # Optional distillation: blend the GT heatmaps with a trained teacher's
    # predictions (--distill-from, usually the big VGG CRAFT) so the lite
    # student also learns the teacher's score SHAPES — the box extractor's
    # thresholds were tuned on those. Teacher runs jitted per page size;
    # maps come back u8-quantized (downlink is cheap, ~148MB/s).
    teacher_fn = None
    if getattr(args, "distill_from", None):
        from bbocr_tpu.models.craft import CRAFTLite as _CL, normalize_image
        from bbocr_tpu.utils.checkpoint import load_params as _lp

        tparams = jax.tree_util.tree_map(jnp.asarray, _lp(args.distill_from))
        ttree = tparams.get("params", {})
        teacher = _CL() if "LiteBackbone_0" in ttree else CRAFT()

        @jax.jit
        def _teacher_maps(pages_u8):
            x = jnp.repeat(pages_u8.astype(jnp.float32)[..., None], 3, -1) / 255.0
            m = teacher.apply(tparams, normalize_image(x))
            return jnp.clip(jnp.round(m * 255.0), 0, 255).astype(jnp.uint8)

        teacher_fn = _teacher_maps
        print(f"distilling from {args.distill_from} (w={args.distill_weight})", flush=True)

    t0 = time.time()
    losses = []
    for step in range(start_step + 1, args.steps + 1):
        pages, maps = q.get()
        if teacher_fn is not None:
            t = np.asarray(teacher_fn(jnp.asarray(pages)))
            w = float(args.distill_weight)
            maps = np.round(
                (1.0 - w) * maps.astype(np.float32) + w * t.astype(np.float32)
            ).astype(np.uint8)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(pages), jnp.asarray(maps)
        )
        losses.append(loss)
        if step % args.log_every == 0 or step == args.steps:
            mean_loss = float(np.mean([float(l) for l in losses]))
            losses = []
            rate = (step - start_step) * args.batch / (time.time() - t0)
            print(
                f"step {step:6d} loss {mean_loss:8.5f} pages/s {rate:7.1f}",
                flush=True,
            )
        if step % args.save_every == 0 or step == args.steps or _STOP_REQUESTED.is_set():
            os.makedirs(args.out, exist_ok=True)
            save_params(os.path.join(args.out, "craft.npz"), jax.device_get(params))
            _maybe_save_state(args, step, params, opt_state)
        if _STOP_REQUESTED.is_set():
            print(f"stopped early at step {step}", flush=True)
            break
    stop.set()
    print(f"saved {os.path.join(args.out, 'craft.npz')}")


def train_vlm(args) -> None:
    import json

    import jax
    import jax.numpy as jnp

    from bbocr_tpu.models.vlm import PageReader, decode_ids, greedy_generate
    from bbocr_tpu.train import make_optimizer
    from bbocr_tpu.train.trainer import make_vlm_train_step
    from bbocr_tpu.train.synth import PageGenerator, SynthConfig
    from bbocr_tpu.utils.checkpoint import save_params

    h, w = int(str(args.page_h).split(",")[0]), int(str(args.page_w).split(",")[0])

    aux_w = float(getattr(args, "vlm_ctc_weight", 0.0) or 0.0)

    def make_batch(seed):
        gen = PageGenerator(SynthConfig(), seed=seed)
        out = gen.batch_labeled(
            args.batch, h, w, target=args.vlm_target, with_ctc=aux_w > 0
        )
        return (out[0].astype(np.uint8),) + tuple(out[1:])

    # fork workers BEFORE the first jax computation (see _prefetch)
    q, stop = _prefetch(make_batch, n_threads=args.data_threads)

    model = PageReader()
    params = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, h, w, 1), jnp.float32),
        jnp.zeros((1, 8), jnp.int32),
        with_ctc=aux_w > 0,  # materialize the aux CTC head's params
    )
    if args.init_from:
        from bbocr_tpu.utils.checkpoint import load_params

        loaded = jax.tree_util.tree_map(jnp.asarray, load_params(args.init_from))
        if aux_w > 0 and "ctc_head" not in loaded.get("params", {}):
            # resuming a pre-aux checkpoint into the aux recipe: keep the
            # fresh CTC head, take everything else from the checkpoint
            loaded["params"]["ctc_head"] = params["params"]["ctc_head"]
        params = loaded
        print(f"initialized from {args.init_from}", flush=True)
    tx = make_optimizer(_train_config(args))
    opt_state = tx.init(params)
    params, opt_state, start_step = _maybe_resume(args, params, opt_state)
    step_fn = make_vlm_train_step(model, tx, ctc_weight=aux_w)

    val_gen = PageGenerator(SynthConfig(), seed=999_999)
    val_pages, val_tokens, val_lens = val_gen.batch_labeled(8, h, w, target=args.vlm_target)
    from bbocr_tpu.models.vlm import decode_ids as _dec

    val_refs = [_dec(val_tokens[i]) for i in range(8)]

    def val_exact(p):
        ids = np.asarray(
            greedy_generate(p, model, jnp.asarray(val_pages, jnp.float32)[..., None])
        )
        hyps = [decode_ids(ids[i]) for i in range(len(val_refs))]
        def fields(s):
            try:
                return json.loads(s)
            except Exception:
                return {}
        hits = total = 0
        for r, hyp in zip(val_refs, hyps):
            fr, fh = fields(r), fields(hyp)
            for k, v in fr.items():
                total += 1
                hits += fh.get(k) == v
        return hits / max(total, 1), hyps[0]

    t0 = time.time()
    losses = []
    for step in range(start_step + 1, args.steps + 1):
        batch = q.get()
        params, opt_state, loss = step_fn(
            params, opt_state, *(jnp.asarray(a) for a in batch)
        )
        losses.append(loss)
        if step % args.log_every == 0 or step == args.steps:
            mean_loss = float(np.mean([float(l) for l in losses]))
            losses = []
            acc, sample = val_exact(params)
            rate = (step - start_step) * args.batch / (time.time() - t0)
            print(
                f"step {step:6d} loss {mean_loss:8.4f} val_field_acc {acc:.3f} "
                f"pages/s {rate:7.1f} sample {sample[:70]!r}",
                flush=True,
            )
        if step % args.save_every == 0 or step == args.steps or _STOP_REQUESTED.is_set():
            os.makedirs(args.out, exist_ok=True)
            name = "vlm.npz" if args.vlm_target == "json" else "vlm_read.npz"
            save_params(os.path.join(args.out, name), jax.device_get(params))
            _maybe_save_state(args, step, params, opt_state)
        if _STOP_REQUESTED.is_set():
            print(f"stopped early at step {step}", flush=True)
            break
    stop.set()
    name = "vlm.npz" if args.vlm_target == "json" else "vlm_read.npz"
    print(f"saved {os.path.join(args.out, name)}")


def main():
    p = argparse.ArgumentParser(description="Train bbocr_tpu models on synthetic data")
    p.add_argument("--component", choices=["crnn", "craft", "vlm"], required=True)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--width", type=str, default="256",
                   help="crnn crop width, or comma list to mix buckets (e.g. 64,128,256,384)")
    p.add_argument("--page-h", type=str, default="256",
                   help="craft page height, or comma list to mix sizes (e.g. 256,512)")
    p.add_argument("--page-w", type=str, default="192",
                   help="craft page width(s), zipped with --page-h")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="checkpoints")
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--save-every", type=int, default=500)
    p.add_argument("--data-threads", type=int, default=4)
    p.add_argument("--init-from", type=str, default=None,
                   help="warm-start params from an .npz checkpoint")
    p.add_argument("--schedule", choices=["constant", "cosine"], default="constant",
                   help="LR schedule (cosine = warmup then cosine decay over --steps)")
    p.add_argument("--warmup", type=int, default=0, help="linear warmup steps")
    p.add_argument("--charset", choices=["en", "latin_ext", "cjk"], default="en",
                   help="recognizer head charset (latin_ext/cjk = BASELINE config 4; "
                        "cjk requires fonts with CJK coverage)")
    p.add_argument("--neg-ratio", type=float, default=3.0,
                   help="craft loss: weight on background (false-positive) MSE")
    p.add_argument("--arch", choices=["vgg", "lite"], default="vgg",
                   help="craft architecture: vgg = full VGG16-BN CRAFT, "
                        "lite = CRAFTLite (~1/8 FLOPs; the serving engine "
                        "picks the arch from the checkpoint's param tree)")
    p.add_argument("--distill-from", type=str, default=None,
                   help="craft: teacher checkpoint whose predicted heatmaps "
                        "are blended into the training targets")
    p.add_argument("--distill-weight", type=float, default=0.5,
                   help="blend weight on the teacher's heatmaps (0..1)")
    p.add_argument("--vlm-ctc-weight", type=float, default=0.0,
                   help="weight of the encoder CTC auxiliary loss (0 = off); "
                        "grounds the encoder tokens in character identity "
                        "(round-2: cross-attention never learns to read "
                        "from the CE loss alone)")
    p.add_argument("--vlm-target", choices=["json", "text"], default="json",
                   help="vlm training target: json = metadata (end task), "
                        "text = literal page transcription (reading curriculum)")
    p.add_argument("--pipeline-crops", type=str, default=None,
                   help="DIR[:frac] of pipeline-consistent crops "
                        "(cli/make_pipeline_crops) to mix into crnn batches")
    p.add_argument("--val-real", type=str, default=None,
                   help="dir of harvested real crops (cli/harvest_real_crops)"
                        " to report real_cer on during crnn training")
    p.add_argument("--state-dir", type=str, default=None,
                   help="orbax train-state dir: saves full resumable state every "
                        "--save-every and auto-resumes from the latest checkpoint")
    args = p.parse_args()
    # Honor JAX_PLATFORMS=cpu over the axon sitecustomize pin (side-process
    # training / CI on hosts where the tunneled chip is busy or down).
    from bbocr_tpu.utils.env import sync_platform_from_env

    sync_platform_from_env()
    _install_sigterm_handler()
    if args.component == "crnn":
        train_crnn(args)
    elif args.component == "vlm":
        train_vlm(args)
    else:
        train_craft(args)
    # Force a clean exit: terminated data workers can leave the mp.Queue
    # feeder wedged and the interpreter hanging AFTER all work is done and
    # saved (observed: a finished 1-step run alive 40+ min). A hung-at-exit
    # trainer burns the driver's whole timeout budget per chain step.
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
