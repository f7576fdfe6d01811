"""PageReader (BASELINE config 5) quality gate.

Two measurements, matching the round-2 VERDICT #6 "done" bar:

1. ``--synthetic``: exact-JSON rate + per-field accuracy on HELD-OUT
   synthetic title pages (generator seeded far outside the training
   stream) — target >= 0.8 exact-JSON.
2. ``--real``: field accuracy (exact + fuzzy) on ``data/real/`` — the
   reference's own photos, scored with the same fuzzy methodology as
   ``cli/evaluate`` — target: non-zero.

Reference role being replaced: the external-VLM step at
``pipeline_demo/extractor/enhanced_extractor.py:836-877``.

    python -m bbocr_tpu.cli.vlm_eval --ckpt /tmp/ckpt_vlm_r3/vlm.npz
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from typing import Any, Dict, List

import numpy as np

from bbocr_tpu.cli.evaluate import fuzzy_ratio, _norm


def _load(ckpt: str):
    import jax

    from bbocr_tpu.models.vlm import PageReader
    from bbocr_tpu.utils.checkpoint import load_params

    model = PageReader()
    params = jax.tree_util.tree_map(jax.numpy.asarray, load_params(ckpt))
    return model, params


def _generate(model, params, pages: np.ndarray) -> List[str]:
    import jax.numpy as jnp

    from bbocr_tpu.models.vlm import decode_ids, greedy_generate

    ids = np.asarray(
        greedy_generate(params, model, jnp.asarray(pages, jnp.float32)[..., None])
    )
    return [decode_ids(ids[i]) for i in range(ids.shape[0])]


def _parse(s: str) -> Dict[str, Any]:
    try:
        from bbocr_tpu.extract import repair_and_parse

        return repair_and_parse(s) or {}
    except Exception:
        return {}


def eval_synthetic(model, params, n: int, batch: int, h: int, w: int) -> Dict[str, Any]:
    from bbocr_tpu.train.synth import PageGenerator, SynthConfig

    gen = PageGenerator(SynthConfig(), seed=777_777)  # held out from training
    exact = valid = 0
    field_hits = field_total = 0
    for start in range(0, n, batch):
        b = min(batch, n - start)
        pages = np.zeros((b, h, w), np.float32)
        refs: List[str] = []
        for i in range(b):
            pages[i], js, _ = gen.render_labeled(h, w)
            refs.append(js)
        hyps = _generate(model, params, pages)
        for ref, hyp in zip(refs, hyps):
            exact += hyp == ref
            fr, fh = _parse(ref), _parse(hyp)
            valid += bool(fh)
            for k, v in fr.items():
                field_total += 1
                field_hits += fh.get(k) == v
    return {
        "n": n,
        "exact_json": round(exact / n, 3),
        "valid_json": round(valid / n, 3),
        "field_acc": round(field_hits / max(field_total, 1), 3),
    }


def eval_real(model, params, real_dir: str) -> Dict[str, Any]:
    from PIL import Image

    from bbocr_tpu.llm.native_vlm import PAGE_H, PAGE_W

    with open(os.path.join(real_dir, "ground_truth.json")) as f:
        books = json.load(f)["books"]
    rows = []
    exact = fuzzy = total = 0
    for key, truth in sorted(books.items()):
        if key.startswith("covers/"):
            paths = [os.path.join(real_dir, key + ".png")]
        else:
            paths = sorted(
                os.path.join(real_dir, key, img) for img in truth.get("images", [])
            )
        if not paths or not os.path.isfile(paths[0]):
            continue
        img = Image.open(paths[0]).convert("L")
        scale = min(PAGE_H / img.height, PAGE_W / img.width)
        nh, nw = max(1, round(img.height * scale)), max(1, round(img.width * scale))
        img = img.resize((nw, nh), Image.BILINEAR)
        page = np.full((PAGE_H, PAGE_W), 255, np.float32)
        page[:nh, :nw] = np.asarray(img, np.float32)
        hyp = _parse(_generate(model, params, page[None])[0])
        row = {"book": key}
        for fld in ("title", "publisher", "year"):
            want = truth.get(fld)
            got = hyp.get(fld)
            if want is None:
                continue
            total += 1
            e = _norm(str(got or "")) == _norm(str(want))
            fz = e or fuzzy_ratio(str(got or ""), str(want)) >= 0.8
            exact += e
            fuzzy += fz
            row[fld] = {"want": want, "got": got, "fuzzy": bool(fz)}
        aw = truth.get("authors") or []
        ag = hyp.get("authors") or []
        if aw:
            total += 1
            fz = any(
                fuzzy_ratio(str(g), str(w)) >= 0.8 for g in ag for w in aw
            )
            fuzzy += fz
            exact += [_norm(str(x)) for x in ag] == [_norm(str(x)) for x in aw]
            row["authors"] = {"want": aw, "got": ag, "fuzzy": bool(fz)}
        rows.append(row)
    return {
        "books": len(rows),
        "fields": total,
        "exact_acc": round(exact / max(total, 1), 3),
        "fuzzy_acc": round(fuzzy / max(total, 1), 3),
        "rows": rows,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=os.path.join("checkpoints", "vlm.npz"))
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--page-h", type=int, default=256)
    p.add_argument("--page-w", type=int, default=192)
    p.add_argument("--real-dir", default=os.path.join("data", "real"))
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--real", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    if not (args.synthetic or args.real):
        args.synthetic = args.real = True

    from bbocr_tpu.utils.env import sync_platform_from_env

    sync_platform_from_env()
    model, params = _load(args.ckpt)
    report: Dict[str, Any] = {"ckpt": args.ckpt}
    if args.synthetic:
        report["synthetic"] = eval_synthetic(
            model, params, args.n, args.batch, args.page_h, args.page_w
        )
        print(json.dumps({"synthetic": report["synthetic"]}), flush=True)
    if args.real:
        report["real"] = eval_real(model, params, args.real_dir)
        print(
            json.dumps({"real": {k: v for k, v in report["real"].items() if k != "rows"}}),
            flush=True,
        )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
