import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_object_detection_tpu.models.fcos import FCOS, HISFCOS, MNFCOS
from pytorch_object_detection_tpu.models.registry import available_models, build_model
from pytorch_object_detection_tpu.utils.model_info import count_params, model_info


def test_hisfcos_param_parity():
    # reference: 32,662,846 (model/od/HISFcos.py:11).  Our count differs only
    # by dead/shared norm modules the reference counts but never uses
    # (HISFcos.py:137-145): tolerance 1024 params.
    info = model_info(HISFCOS(num_classes=20), (1, 512, 512, 3))
    assert abs(info["params"] - 32_662_846) <= 1024, info["params"]
    assert info["params_by_module"]["backbone"] == 23_508_032  # resnet50.py:44-48
    assert info["params_by_module"]["head"] == 1_507_358  # HISFcos.py:248 comment


def test_fcos_param_parity():
    # 32,157,022 is the true count of the reference's current FCOS assembly
    # (recorded at HISFcos.py:242); the Fcos.py docstring (30,976,860) is stale.
    info = model_info(FCOS(num_classes=20), (1, 512, 512, 3))
    assert info["params"] == 32_157_022, info["params"]


@pytest.mark.parametrize("model_ctor", [FCOS, HISFCOS, MNFCOS])
def test_forward_shapes_and_finiteness(model_ctor):
    model = model_ctor(num_classes=20)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (2, 128, 128, 3))
    variables = model.init(rng, img, False)
    cls, cnt, reg = model.apply(variables, img, False)
    assert len(cls) == len(cnt) == len(reg) == 5
    expected_hw = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    for c, n, r, hw in zip(cls, cnt, reg, expected_hw):
        assert c.shape == (2, *hw, 20)
        assert n.shape == (2, *hw, 1)
        assert r.shape == (2, *hw, 4)
        assert bool(jnp.isfinite(c).all() & jnp.isfinite(n).all() & jnp.isfinite(r).all())
        assert bool((r >= 0).all())  # ScaleExp output is exp(): positive ltrb


def test_cls_prior_bias_init():
    # with prior 0.01 the initial cls probability must be ~0.01 everywhere
    model = HISFCOS(num_classes=20)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 64, 64, 3))
    variables = model.init(rng, img, False)
    cls, _, _ = model.apply(variables, img, False)
    p = jax.nn.sigmoid(cls[0])
    mean_p = float(jnp.mean(p))
    assert 0.003 < mean_p < 0.03, mean_p


def test_registry_builds_all():
    names = available_models()
    assert {"FCOS", "HISFCOS", "MNFCOS"} <= set(names)
    m = build_model("hisfcos", num_classes=80)
    assert m.num_classes == 80


def test_batch_stats_collection_exists():
    # frozen BN uses running stats: they must live in batch_stats
    model = HISFCOS(num_classes=20)
    variables = jax.eval_shape(
        lambda r, x: model.init(r, x, False), jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    assert "batch_stats" in variables
    assert count_params(variables["batch_stats"]) > 0


def test_s2d_stem_matches_conv7():
    """space-to-depth stem is an exact rewrite of the 7x7/2 stem."""
    from pytorch_object_detection_tpu.nn.resnet import ResNet50, s2d_stem_kernel

    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    m7 = ResNet50(stem_mode="conv7")
    v7 = m7.init(jax.random.PRNGKey(1), img, False)
    ms = ResNet50(stem_mode="s2d")
    vs = ms.init(jax.random.PRNGKey(1), img, False)
    # graft the conv7 weights (transformed) into the s2d model
    params = jax.tree_util.tree_map(lambda x: x, vs["params"])
    params["conv1_s2d"] = {"kernel": s2d_stem_kernel(v7["params"]["conv1"]["conv"]["kernel"])}
    for key in v7["params"]:
        if key not in ("conv1",):
            params[key] = v7["params"][key]
    out7 = m7.apply(v7, img, False)
    outs = ms.apply({"params": params, "batch_stats": v7["batch_stats"]}, img, False)
    for a, b in zip(out7, outs):
        # tiny fp32 rounding differences accumulate through 50 layers
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-3)
