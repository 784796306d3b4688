"""Offline preprocessing CLI: raw downloads -> per-task sample JSONs + vocab.

`python -m gpv_tpu.cli.preprocess data_dir=<dir> [subsets=train,val]`

Runs the reference's preprocess_* + create_coco_vocab steps
(`setup_data.sh:1-20`) over the original_split; SCE splits are produced by
`python -m gpv_tpu.cli.make_sce_split`.
"""
import json
import sys
from pathlib import Path


def main(argv=None):
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    data_dir = Path(args["data_dir"])
    root = data_dir / "learning_phase_data"
    subsets = args.get("subsets", "train,val").split(",")

    from gpv_tpu.data.preprocess import (dump_samples, preprocess_captions,
                                         preprocess_classification,
                                         preprocess_detection,
                                         preprocess_vqa)

    coco_subset = {"train": "train2014", "val": "val2014"}
    for subset in subsets:
        cs = coco_subset.get(subset, subset)
        inst_path = root / f"coco/annotations/instances_{cs}.json"
        if inst_path.exists():
            inst = json.loads(inst_path.read_text())
            dump_samples(preprocess_detection(inst),
                         root / "coco_detection/original_split", subset)
            dump_samples(preprocess_classification(inst),
                         root / "coco_classification/original_split", subset)
        cap_path = root / f"coco/annotations/captions_{cs}.json"
        if cap_path.exists():
            caps = json.loads(cap_path.read_text())
            dump_samples(preprocess_captions(caps),
                         root / "coco_captions/original_split", subset)
        q_path = root / ("vqa/questions/"
                         f"v2_OpenEnded_mscoco_{cs}_questions.json")
        a_path = root / f"vqa/anno/v2_mscoco_{cs}_annotations.json"
        if q_path.exists():
            qs = json.loads(q_path.read_text())
            annos = json.loads(a_path.read_text()) if a_path.exists() else None
            dump_samples(preprocess_vqa(qs, annos),
                         root / "coco_vqa/original_split", subset)

    # vocab over whatever was produced
    from gpv_tpu.data.vocab_builder import build_vocab, write_vocab
    answers = []
    for task in ("coco_captions", "coco_detection", "coco_classification",
                 "coco_vqa"):
        for subset in subsets:
            p = root / f"{task}/original_split/{subset}.json"
            if p.exists():
                for s in json.loads(p.read_text()):
                    if "answer" in s:
                        answers.append(s["answer"])
    vocab, cnt = build_vocab(answers, min_count=10)
    write_vocab(vocab, cnt, root / "vocab")
    print(f"vocab size: {len(vocab)}")


if __name__ == "__main__":
    main()
