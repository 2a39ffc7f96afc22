"""Feature-extractor trunks: shape contracts + weight-conversion mapping."""

import jax
import jax.numpy as jnp
import numpy as np

from vqa_attention_networks_tpu.models import resnet, vgg


def test_resnet_tiny_trunk_shapes():
    # tiny stage depths (1,1,1,1) through the same apply() code path:
    # 64px input -> /32 -> 2x2 grid of 2048 channels
    params = resnet.random_init(jax.random.PRNGKey(0), stages=(1, 1, 1, 1))
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out = resnet.apply(params, imgs, dtype=jnp.float32)
    assert out.shape == (2, 4, 2048)
    assert np.isfinite(np.asarray(out)).all()


def test_resnet_preprocess_matches_reference_normalisation():
    # extract_image_features.py:55-60: resize 448 + ImageNet mean/std
    img = np.full((1, 8, 8, 3), 255, np.uint8)
    out = np.asarray(resnet.preprocess(jnp.asarray(img), size=4))
    want = (1.0 - resnet.IMAGENET_MEAN) / resnet.IMAGENET_STD
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)
    assert out.shape == (1, 4, 4, 3)


def test_resnet_conversion_key_mapping():
    # synthesise a torchvision-style state_dict for a (1,1,1,1) trunk and
    # check folded-BN math: y = (x - mean)/sqrt(var+eps)*gamma + beta
    rng = np.random.default_rng(0)
    sd = {}

    def add_conv_bn(conv_key, bn_key, cin, cout, k):
        sd[conv_key] = rng.standard_normal((cout, cin, k, k)).astype(np.float32)
        sd[bn_key + ".weight"] = rng.standard_normal(cout).astype(np.float32)
        sd[bn_key + ".bias"] = rng.standard_normal(cout).astype(np.float32)
        sd[bn_key + ".running_mean"] = rng.standard_normal(cout).astype(np.float32)
        sd[bn_key + ".running_var"] = np.abs(
            rng.standard_normal(cout)
        ).astype(np.float32) + 0.5

    add_conv_bn("conv1.weight", "bn1", 3, 64, 7)
    cin = 64
    for s, width in enumerate(resnet.WIDTHS):
        cout = width * resnet.EXPANSION
        pre = f"layer{s + 1}.0"
        add_conv_bn(f"{pre}.conv1.weight", f"{pre}.bn1", cin, width, 1)
        add_conv_bn(f"{pre}.conv2.weight", f"{pre}.bn2", width, width, 3)
        add_conv_bn(f"{pre}.conv3.weight", f"{pre}.bn3", width, cout, 1)
        add_conv_bn(f"{pre}.downsample.0.weight", f"{pre}.downsample.1",
                    cin, cout, 1)
        cin = cout

    # conversion must not raise for the single-block layout, and the stem's
    # folded scale/bias must reproduce BN exactly
    import vqa_attention_networks_tpu.models.resnet as R
    orig_stages = R.STAGES
    try:
        R.STAGES = (1, 1, 1, 1)
        params = R.convert_torchvision_resnet152(sd)
    finally:
        R.STAGES = orig_stages

    assert params["stem"]["w"].shape == (7, 7, 3, 64)
    gamma = sd["bn1.weight"]
    beta = sd["bn1.bias"]
    mean = sd["bn1.running_mean"]
    var = sd["bn1.running_var"]
    x = rng.standard_normal(64).astype(np.float32)
    want = (x - mean) / np.sqrt(var + 1e-5) * gamma + beta
    got = x * params["stem"]["scale"] + params["stem"]["bias"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_vgg_taps_shapes():
    params = vgg.random_init(jax.random.PRNGKey(0))
    assert len(params["convs"]) == 16  # VGG-19 has 16 conv layers
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    f27, f36 = vgg.apply(params, imgs, taps=(27, 36), dtype=jnp.float32)
    # torchvision indices 27/36 are pool4/pool5: /16 and /32 downsampling
    # (at the reference's 224 input, tap 27 is the 14x14x512 grid its
    # predict path flattens to [1, 196, 512], predict_pytorch.py:48-50)
    assert f27.shape == (1, 4, 4, 512)
    assert f36.shape == (1, 2, 2, 512)
    grid = vgg.grid_features(params, imgs, tap=27, dtype=jnp.float32)
    assert grid.shape == (1, 16, 512)


def test_resnet_apply_handles_arbitrary_stage_counts():
    # apply() derives the stage COUNT from the params: a 2-stage test trunk
    # must run (previously a hardcoded range(4) raised KeyError 'layer3')
    import jax
    import jax.numpy as jnp

    from vqa_attention_networks_tpu.models import resnet

    params = resnet.random_init(jax.random.PRNGKey(0), stages=(1, 1))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out = resnet.apply(params, x)
    assert out.ndim == 3  # [N, regions, C]
