"""Config mapping tests against the actual release config files."""
import os
import pytest

from vistracker_tpu.config import (load_reference_json,
                                   sifnet_config_from_json,
                                   infiller_config_from_json,
                                   train_config_from_json, PathsConfig)

TRI_VIS = "/root/reference/config/tri-vis-l2.json"
CMF = "/root/reference/config/cmf-k4-lrot.json"


@pytest.mark.skipif(not os.path.isfile(TRI_VIS), reason="no reference configs")
def test_tri_vis_l2_mapping():
    cfg = sifnet_config_from_json(load_reference_json(TRI_VIS))
    assert cfg.num_stack == 3
    assert cfg.num_hourglass == 2
    assert cfg.hourglass_dim == 256
    assert cfg.triplane_hg_dim == 64
    assert cfg.triplane_tmpx_dim == 32
    assert cfg.triplane_shared
    assert cfg.crop_size == 1200
    assert cfg.max_dist == 0.1
    assert cfg.loss_weights == (1.0, 1.0, 0.006, 500, 1000, 1000)
    assert cfg.feature_size == 611

    tcfg = train_config_from_json(load_reference_json(TRI_VIS))
    assert tcfg.learning_rate == 0.001
    assert tcfg.milestones == (15, 25)


@pytest.mark.skipif(not os.path.isfile(CMF), reason="no reference configs")
def test_cmf_k4_lrot_mapping():
    cfg = infiller_config_from_json(load_reference_json(CMF))
    assert cfg.dim_smpl == 147 and cfg.dim_obj == 6 and cfg.out_dim == 6
    assert cfg.d_model_smpl == 128 and cfg.num_layers_smpl == 2
    assert cfg.d_model_obj == 32 and cfg.num_heads_obj == 2
    assert cfg.num_layers_joint == 4 and cfg.num_heads_joint == 1
    assert cfg.activation_joint == "gelu"
    assert not cfg.pre_norm_joint  # quirk: pre-norm layers, no final norm
    assert cfg.hidden_dims == (32,)
    assert cfg.clip_len == 180
    assert cfg.window == 30  # json 'window': 1 means slide step -> carry 30


def test_paths_config_defaults():
    p = PathsConfig()
    assert isinstance(p.recon_root, str)
