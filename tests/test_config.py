"""Config engine tests: composition, interpolation, overrides, @package."""
import pytest

from gpv_tpu.utils.config import ConfigNode, load_config, to_dict


class TestConfigEngine:
    def test_compose_defaults_and_interpolate(self):
        cfg = load_config("configs", "exp/gpv")
        assert cfg.model.detr.num_queries == 100
        # ${model.hidden_dim} interpolation
        assert cfg.model.co_att.bi_hidden_size == 768
        assert cfg.model.detr_joiner.out_dim == 768
        # ${losses} full-node interpolation
        assert cfg.model.losses.Localization.eos_coef == 0.1
        # defaults group landed under the @package target
        assert "coco_vqa" in cfg.task_configs
        # nested interpolation through task_configs
        assert "coco/images" in cfg.task_configs.coco_vqa.image_dir

    def test_group_override(self):
        cfg = load_config("configs", "exp/gpv",
                          ["learning_datasets=det_vqa_cap"])
        assert set(cfg.learning_datasets) == {
            "CocoDetection", "CocoVqa", "CocoCaptioning"}

    def test_group_override_reaches_nested_defaults(self):
        """hydra applies `group=choice` to the WHOLE composition: the
        learning_datasets entry lives in exp/gpv's defaults, which
        exp/gpv_inference composes as a plain entry — the override must
        reach it (it used to be silently dropped)."""
        cfg = load_config("configs", "exp/gpv_inference",
                          ["learning_datasets=all"])
        assert {"CocoDetection", "CocoVqa", "CocoCaptioning",
                "CocoClassification"} <= set(cfg.learning_datasets)

    def test_embedded_interpolation_cycle_raises(self):
        """a: x${b} / b: y${a} must raise the cycle ValueError, not
        RecursionError (the whole-string path already did)."""
        from gpv_tpu.utils.config import _resolve
        cfg = ConfigNode({"a": "x${b}", "b": "y${a}"})
        with pytest.raises(ValueError, match="cycle"):
            _resolve(cfg, cfg)

    def test_unknown_group_choice_raises(self):
        """A typo'd GROUP choice must fail like hydra, not silently set a
        string value where a composed dict is expected."""
        with pytest.raises(ValueError, match="unknown option 'tpyo'"):
            load_config("configs", "exp/gpv", ["learning_datasets=tpyo"])

    def test_value_overrides_with_types(self):
        cfg = load_config("configs", "exp/gpv", [
            "training.lr=5e-4", "training.freeze=True",
            "model.detr.num_queries=64", "training.ckpt=null",
            "training.lr_milestones=[1,2]"])
        assert cfg.training.lr == 5e-4
        assert cfg.training.freeze is True
        assert cfg.model.detr.num_queries == 64
        assert cfg.training.ckpt is None
        assert cfg.training.lr_milestones == [1, 2]

    def test_interpolation_follows_overrides(self):
        cfg = load_config("configs", "exp/gpv",
                          ["model.hidden_dim=256"])
        assert cfg.model.co_att.bi_hidden_size == 256
        assert cfg.model.text_decoder.hidden_dim == 256

    def test_exp_dir_composition(self):
        cfg = load_config("configs", "exp/gpv",
                          ["output_dir=/tmp/o", "exp_name=run1"])
        assert cfg.exp_dir == "/tmp/o/run1"
        assert cfg.ckpt_dir == "/tmp/o/run1/ckpts"

    def test_missing_interpolation_raises(self):
        import pytest as pt
        node = ConfigNode({"a": "${nope.xyz}"})
        from gpv_tpu.utils.config import _resolve
        with pt.raises(KeyError):
            _resolve(node, node)

    def test_to_dict_roundtrip(self):
        cfg = load_config("configs", "exp/gpv")
        d = to_dict(cfg)
        assert isinstance(d, dict)
        assert d["model"]["detr"]["nheads"] == 8


class TestBuildGpvGuards:
    def test_rejects_roi_head_with_all_decoder_layers(self):
        """roi_head + last_layer_only=False crashes the reference in
        training (detr_roi_head.py:90-92 torch.cat shape mismatch for
        L>1); build_gpv must reject it at build time (PARITY.md #1)."""
        from gpv_tpu.models.gpv import build_gpv

        cfg = load_config("configs", "exp/gpv",
                          ["model.detr.last_layer_only=False"])
        with pytest.raises(ValueError, match="last_layer_only"):
            build_gpv(cfg.model, vocab_size=50)

    def test_accepts_all_layers_without_roi_head(self):
        from gpv_tpu.models.gpv import build_gpv

        cfg = load_config("configs", "exp/gpv",
                          ["model.detr.last_layer_only=False",
                           "model.roi_head=False",
                           "model.detr.aux_loss=True",
                           # without the RoI head the joiner input is the
                           # bare 256-d query state (upstream the user must
                           # resize detr_joiner too or its Linear crashes)
                           "model.detr_joiner.detr_dim=256"])
        model = build_gpv(cfg.model, vocab_size=50)
        assert model.detr_cfg["last_layer_only"] is False

    def test_host_resize_flows_to_per_task_nodes(self):
        """`task_configs.host_resize=exact` must reach the PER-TASK config
        nodes the datasets are constructed from (GenericCocoDataset reads
        cfg.get('host_resize') off its own node, not the root — review r5:
        the yaml lacked the interpolation, making the documented knob
        inoperative through the config path)."""
        cfg = load_config("configs", "exp/gpv",
                          ["task_configs.host_resize=exact"])
        for t in ("coco_captioning", "coco_detection", "coco_vqa",
                  "coco_classification"):
            assert cfg.task_configs[t].get("host_resize") == "exact", t
        # default is the fast production path
        cfg = load_config("configs", "exp/gpv")
        assert cfg.task_configs.coco_vqa.get("host_resize") == "pil"
