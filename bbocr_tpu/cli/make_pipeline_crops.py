"""Pipeline-consistent training crops: synthetic pages THROUGH the engine.

The recognizer trains on generator-rendered crops, but serves on crops that
went through letterbox -> CRAFT -> CC quads -> rectification. Quad growth,
warp resampling, and detector framing all shift the distribution; this tool
closes that gap with self-labeled data: render synthetic pages at
serving-like sizes (the line texts are KNOWN), run the REAL serving engine
over them, and keep rectified crops whose decode fuzzy-aligns to a drawn
line (same alignment as cli/harvest_real_crops — junk quads align to
nothing and drop out). Output feeds ``cli/train --component crnn
--pipeline-crops DIR[:frac]`` which mixes these into every batch.

Unlike data/real_crops (76 crops, eval-corpus-derived, validation only),
this corpus is unbounded and fully synthetic — safe to TRAIN on.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--craft", default="checkpoints/craft.npz")
    p.add_argument("--crnn", default="checkpoints/crnn.npz")
    p.add_argument("--out", default="/tmp/pipeline_crops")
    p.add_argument("--pages", type=int, default=400)
    p.add_argument("--page-h", type=int, default=704)
    p.add_argument("--page-w", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-cer", type=float, default=0.3,
                   help="alignment gate; tighter than the real harvest "
                        "because synthetic decodes should be close")
    args = p.parse_args()
    from bbocr_tpu.utils.env import sync_platform_from_env

    sync_platform_from_env()

    from bbocr_tpu.cli.harvest_real_crops import harvest_image
    from bbocr_tpu.runtime.engine import OCREngine
    from bbocr_tpu.train.synth import PageGenerator, SynthConfig

    engine = OCREngine.from_checkpoint(args.craft, args.crnn)
    gen = PageGenerator(SynthConfig(), seed=args.seed)
    os.makedirs(args.out, exist_ok=True)
    labels: dict = {}
    stats = {"pages": 0, "crops_seen": 0, "crops_kept": 0}
    for i in range(args.pages):
        page, _ = gen.render(args.page_h, args.page_w)
        phrases = [t for t in getattr(gen, "last_texts", []) if t.strip()]
        # last_texts lives on the generator that drew the lines
        if not phrases:
            phrases = [t for t in getattr(gen.lines, "last_texts", []) if t.strip()]
        if not phrases:
            continue
        stats["pages"] += 1
        harvest_image(
            engine, page.astype(np.uint8), phrases, f"page{i:05d}",
            args.out, labels, stats, max_cer=args.max_cer,
            # Per-page phrase lists are small, so a unique weak match still
            # identifies its line: keep hard crops (decode CER up to 0.6)
            # when the runner-up phrase is >=0.25 worse. These are the warp/
            # quad-artifact examples the recognizer most needs.
            margin_accept=(0.6, 0.25),
        )
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{args.pages} pages, kept {stats['crops_kept']}", flush=True)
    with open(os.path.join(args.out, "labels.json"), "w") as f:
        json.dump(labels, f, indent=1, ensure_ascii=False)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
