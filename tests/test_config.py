"""Config system: override grammar, presets, interpolation (SURVEY.md §5)."""

import pytest

from tricolo_tpu.config import load_config


def test_defaults_match_reference_surface():
    cfg = load_config()
    assert cfg.train_seed == 123 and cfg.test_seed == 321
    assert cfg.trainer.max_epochs == 20
    assert cfg.trainer.check_val_every_n_epoch == 2
    assert cfg.optimizer.lr == 0.00035
    assert cfg.optimizer.weight_decay == 1e-6
    assert cfg.loss.name == "NTXentLoss"
    assert cfg.loss.NTXentLoss.temperature == 0.1
    assert cfg.loss.NTXentLoss.alpha_weight == 0.25
    assert cfg.loss.TripletLoss.margin == 0.025
    assert cfg.lr_decay.start_epoch == 20
    assert cfg.checkpoint_monitor.monitor == "val_eval/RR@5"
    assert cfg.checkpoint_monitor.save_top_k == 3
    assert cfg.data.batch_size == 128
    assert cfg.data.image_size == 128
    assert cfg.data.voxel_size == 64
    assert cfg.data.num_views == 6
    assert cfg.data.vocab_size == 3588
    assert cfg.inference.split == "val"


def test_data_presets():
    chair = load_config(["data=text2shape_chair_table"])
    assert chair.data.dataset == "Text2ShapeChairTable"
    assert len(chair.data.ignored_models) == 53
    c13 = load_config(["data=text2shape_c13"])
    assert c13.data.dataset == "Text2ShapeC13"
    assert c13.data.vocab_size == 3968
    assert c13.data.ignored_models == []


def test_interpolation_resolves_across_groups():
    cfg = load_config(["data=text2shape_c13", "experiment_name=run1"])
    # ${data.vocab_size} reaches the BiGRU module config (reference
    # config.yaml:67) and chains through experiment_output_path.
    assert cfg.model.modules.BiGRUEncoder.vocab_size == 3968
    assert cfg.experiment_output_path.endswith("output/Text2ShapeC13/run1")
    assert cfg.checkpoint_monitor.every_n_epochs == 2


def test_override_types_and_plus_keys():
    cfg = load_config(
        [
            "trainer.max_epochs=5",
            "optimizer.lr=1e-3",
            "model.voxel_encoder=SparseCNNEncoder",
            "inference.save_predictions=false",
            "ckpt_name=null",
            "+cpu_workers=4",
        ]
    )
    assert cfg.trainer.max_epochs == 5
    assert cfg.optimizer.lr == pytest.approx(1e-3)
    assert cfg.model.voxel_encoder == "SparseCNNEncoder"
    assert cfg.inference.save_predictions is False
    assert cfg.ckpt_name is None
    assert cfg.cpu_workers == 4


def test_unknown_key_rejected_without_plus():
    with pytest.raises(KeyError):
        load_config(["no.such.key=1"])


def test_unknown_preset_rejected():
    with pytest.raises(KeyError):
        load_config(["data=bogus"])


class TestNoneInterpolation:
    def test_unset_keys_stay_unresolved_until_set(self):
        """A None-valued key must not bake 'None' into paths; setting it
        later and re-resolving completes the interpolation."""
        from tricolo_tpu.config import load_config, resolve_interpolations

        cfg = load_config(["data=synthetic"])
        assert cfg.experiment_name is None
        assert "${experiment_name}" in cfg.experiment_output_path
        assert "None" not in cfg.experiment_output_path
        cfg.experiment_name = "exp1"
        resolve_interpolations(cfg)
        assert cfg.experiment_output_path.endswith("/output/Synthetic/exp1")
        assert cfg.logger.save_dir.endswith("/output/Synthetic/exp1/training")
