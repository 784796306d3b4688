"""Synthetic COCO-format fixture data + tiny config, shared by the e2e
suite (tests/test_e2e.py) and the multi-host trainer worker
(tests/_mh_trainer_worker.py)."""
import json

import numpy as np

IMG_H, IMG_W = 48, 64


def make_fake_data(root):
    """Write a fake COCO learning_phase_data tree (6 samples/task) under
    `root`; returns `root`. Mirrors the reference's on-disk layout
    (exp/gpv/dataset.py json paths)."""
    from PIL import Image
    img_dir = root / "learning_phase_data/coco/images/train2014"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    n_imgs = 8
    for i in range(n_imgs):
        arr = rng.randint(0, 255, (96, 128, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"COCO_train2014_{i:012d}.jpg")

    def image(i):
        return {"subset": "train2014", "image_id": i}

    def dump(task, samples):
        for subset in ("train", "val"):
            d = root / f"learning_phase_data/{task}/gpv_split"
            d.mkdir(parents=True, exist_ok=True)
            (d / f"{subset}.json").write_text(json.dumps(samples))

    cap = [{"query": "describe the image", "answer": "a man riding a horse",
            "cap_id": 100 + i, "image": image(i % n_imgs),
            "coco_categories": {"seen": [], "unseen": []}}
           for i in range(6)]
    dump("coco_captions", cap)

    det = [{"query": "locate the dog", "boxes": [[10, 10, 40, 30],
                                                 [60, 40, 30, 20]],
            "id": 200 + i, "category_id": 18, "category_name": "dog",
            "image": image(i % n_imgs),
            "coco_categories": {"seen": ["dog"], "unseen": []}}
           for i in range(6)]
    dump("coco_detection", det)

    cls = [{"query": "what is this?", "boxes": [20, 20, 40, 40],
            "id": 300 + i, "category_id": 18, "answer": "dog",
            "image": image(i % n_imgs),
            "coco_categories": {"seen": ["dog"], "unseen": []}}
           for i in range(6)]
    dump("coco_classification", cls)

    vqa = [{"query": "how many dogs?", "answer": "two",
            "all_answers": {"two": 7, "three": 3},
            "question_id": 400 + i, "image": image(i % n_imgs),
            "anno": {"answer_type": "number", "question_type": "how many"},
            "coco_categories": {"seen": [], "unseen": []}}
           for i in range(6)]
    dump("coco_vqa", vqa)

    ref = [{"query": "the dog on the left", "boxes": [[10, 10, 40, 30]],
            "sent_id": 500 + i, "image": image(i % n_imgs),
            "coco_categories": {"seen": [], "unseen": []}}
           for i in range(6)]
    d = root / "learning_phase_data/refcocop"
    d.mkdir(parents=True, exist_ok=True)
    for name in ("train", "train_100", "val"):
        (d / f"{name}.json").write_text(json.dumps(ref))
    return root


TINY_OVERRIDES = [
    "model.hidden_dim=32",
    "model.detr.hidden_dim=32",
    "model.detr.nheads=4",
    "model.detr.num_queries=10",
    "model.detr.num_encoder_layers=1",
    "model.detr.num_decoder_layers=1",
    "model.detr.dim_feedforward=64",
    "model.detr.backbone_layers=[1,1,1,1]",
    "model.detr_joiner.detr_dim=2080",
    "model.co_att.num_layers=1",
    "model.co_att.bi_num_attention_heads=4",
    "model.co_att.intermediate_size=64",
    "model.text_decoder.num_layers=1",
    "model.max_text_len=8",
    "model.max_target_boxes=8",
    "model.bert={num_layers: 1, hidden: 32, heads: 4, vocab_size: 100}",
    "model.bert_joiner.bert_dim=32",
    "training.batch_size=8",
    "training.num_epochs=1",
    "training.num_workers=2",
    "training.log_step=1",
    "training.vis_step=100000",
    "training.num_vis_samples=2",
    "eval.batch_size=4",
    "tpu.dtype=float32",
]


def tiny_cfg(data_dir, exp_dir, extra=()):
    from gpv_tpu.utils.config import load_config
    nvs = ["training.num_val_samples={coco_vqa: 4, coco_cap: 4, "
           "coco_det: 4, coco_cls: 4, refcocop: 4}"]
    return load_config("configs", "exp/gpv", [
        f"data_dir={data_dir}", f"output_dir={exp_dir}",
        "exp_name=e2e", "learning_datasets=all",
        "task_configs.image_size={H: %d, W: %d}" % (IMG_H, IMG_W),
    ] + TINY_OVERRIDES + nvs + list(extra))
