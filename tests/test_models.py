"""Model unit tests (SURVEY.md §4.2.2): mask shapes/ranges, D logits,
gradient-flow smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_sass_tf_tpu import config, models


def _feats(cfg, b=2, key=0):
    t = cfg.num_frames
    return jax.random.normal(
        jax.random.PRNGKey(key), (b, t, cfg.dsp.feature_dim)
    )


GEN_CASES = [
    ("2src_toy_cpu", "toy"),
    ("2src_toy_cpu", "conv"),
    ("wsj0_logmel", "conv"),       # mel features -> interp head to linear bins
    ("3src_pit", "bilstm"),        # softmax masks, 3 sources
    ("music_complex_44k", "conv"),  # complex masks
]


@pytest.mark.parametrize("cfg_name,gen_name", GEN_CASES)
def test_generator_shapes_and_ranges(cfg_name, gen_name):
    cfg = config.get_config(cfg_name)
    cfg = cfg.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "generator": gen_name}))
    g = models.build_generator(cfg)
    feats = _feats(cfg)
    params = g.init(jax.random.PRNGKey(0), feats)
    masks = g.apply(params, feats)
    s, k = cfg.data.num_sources, cfg.dsp.n_bins
    if cfg.dsp.mask_type == "complex":
        assert masks.shape == (2, s, cfg.num_frames, k, 2)
        assert np.abs(np.asarray(masks)).max() <= 1.0 + 1e-6  # tanh-bounded
    else:
        assert masks.shape == (2, s, cfg.num_frames, k)
        m = np.asarray(masks)
        assert m.min() >= 0.0 and m.max() <= 1.0
        if cfg.dsp.mask_activation == "softmax":
            np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)


def test_noise_slot_breaks_sum_to_one():
    """mask_noise_slot: the softmax head emits S+1 slots and discards the
    last, so returned masks keep shape (B,S,T,K) but sum to <1 where the
    model routes energy to the noise sink (the sum-to-1 constraint is what
    structurally blocks noise suppression on the hard protocol)."""
    cfg = config.get_config("3src_pit")
    cfg = cfg.replace(dsp=cfg.dsp.__class__(**{
        **cfg.dsp.__dict__, "mask_noise_slot": True}))
    g = models.build_generator(cfg)
    feats = _feats(cfg)
    params = g.init(jax.random.PRNGKey(0), feats)
    masks = np.asarray(g.apply(params, feats))
    s, k = cfg.data.num_sources, cfg.dsp.n_bins
    assert masks.shape == (2, s, cfg.num_frames, k)
    sums = masks.sum(axis=1)
    assert sums.max() <= 1.0 + 1e-5          # still a sub-distribution
    assert sums.min() < 1.0 - 1e-3           # noise slot actually absorbs


def test_noise_slot_requires_softmax():
    cfg = config.get_config("wsj0_logmel")   # sigmoid masks
    with pytest.raises(ValueError, match="mask_noise_slot"):
        cfg.replace(dsp=cfg.dsp.__class__(**{
            **cfg.dsp.__dict__, "mask_noise_slot": True}))


def test_noise_slot_rejects_complex_masks():
    """The complex tanh exit has no slot axis to drop — the combination
    must fail at config time, not produce S+1 sources at trace time."""
    cfg = config.get_config("music_complex_44k")
    with pytest.raises(ValueError, match="mask_noise_slot"):
        cfg.replace(dsp=cfg.dsp.__class__(**{
            **cfg.dsp.__dict__, "mask_activation": "softmax",
            "mask_noise_slot": True}))


def test_crop_nyquist_invalid_combos_fail_loudly():
    """A silently-inactive perf knob poisons A/B numbers: crop on a mel
    frontend or a non-conv generator must raise, not no-op."""
    mel = config.get_config("wsj0_logmel")   # feature_dim 80 != n_bins
    with pytest.raises(ValueError, match="crop_nyquist"):
        models.build_generator(mel.replace(model=mel.model.__class__(**{
            **mel.model.__dict__, "g_crop_nyquist": True})))
    lstm = config.get_config("3src_pit")     # bilstm generator
    with pytest.raises(ValueError, match="crop_nyquist"):
        models.build_generator(lstm.replace(model=lstm.model.__class__(**{
            **lstm.model.__dict__, "g_crop_nyquist": True})))


def test_crop_nyquist_masks_full_width_top_bin_copied():
    """g_crop_nyquist: the conv U-Net computes on the even K-1 grid (odd
    n_bins pads every full-grid tensor's TPU tiling) and the returned masks
    are still full width, with the Nyquist bin copying its neighbor."""
    cfg = config.get_config("music_complex_44k")
    cfg = cfg.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "g_crop_nyquist": True,
        "g_channels": (8, 16)}))
    g = models.build_generator(cfg)
    feats = _feats(cfg)
    params = g.init(jax.random.PRNGKey(0), feats)
    masks = np.asarray(g.apply(params, feats))
    s, k = cfg.data.num_sources, cfg.dsp.n_bins
    assert k % 2 == 1
    assert masks.shape == (2, s, cfg.num_frames, k, 2)   # complex masks
    np.testing.assert_array_equal(masks[:, :, :, -1], masks[:, :, :, -2])


def test_film_head_is_position_free():
    """g_head_mode='film' (bilstm): mask logits come from bin-local convs
    over the input spectrogram FiLM-modulated by the hidden state — no
    learned parameter carries a bin-position axis (the Dense hidden→K head
    measured an ~11 dB held-out generalization gap on 3src_pit)."""
    cfg = config.get_config("3src_pit")
    cfg = cfg.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "g_head_mode": "film"}))
    g = models.build_generator(cfg)
    feats = _feats(cfg)
    params = g.init(jax.random.PRNGKey(0), feats)
    masks = np.asarray(g.apply(params, feats))
    s, k = cfg.data.num_sources, cfg.dsp.n_bins
    assert masks.shape == (2, s, cfg.num_frames, k)
    np.testing.assert_allclose(masks.sum(axis=1), 1.0, atol=1e-5)
    # No HEAD parameter axis equals (a multiple of) n_bins: nothing learned
    # on the mask-output side is per-bin.  (The trunk necessarily READS the
    # 257-dim input — that is the LSTM input kernel, not a per-output map.)
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    head = [(path, p) for path, p in leaves
            if any("MaskHead" in str(key) for key in path)]
    assert head, "film head params not found"
    for path, p in head:
        for d in np.shape(p):
            assert d % k != 0, (path, np.shape(p))


def test_film_head_requires_linear_grid():
    cfg = config.get_config("wsj0_logmel")   # mel frontend (80 != 257)
    bad = cfg.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "generator": "bilstm",
        "g_head_mode": "film"}))
    with pytest.raises(ValueError, match="film"):
        models.build_generator(bad)


def test_interp_head_is_position_free():
    """g_head_mode='interp' (mel frontends): masks come from a FIXED mel-warp
    resample + 1x1 conv — correct shapes/ranges, far fewer params than the
    dense head, and no parameter carries a per-output-bin axis (the dense
    head's n_bins-sized dims are what memorize trained pitch positions)."""
    cfg = config.get_config("wsj0_logmel")
    k = cfg.dsp.n_bins

    def build(head_mode):
        c = cfg.replace(model=cfg.model.__class__(**{
            **cfg.model.__dict__, "g_head_mode": head_mode}))
        g = models.build_generator(c)
        feats = _feats(c)
        params = g.init(jax.random.PRNGKey(0), feats)
        return g, feats, params

    g, feats, params = build("interp")
    masks = g.apply(params, feats)
    s = cfg.data.num_sources
    assert masks.shape == (2, s, cfg.num_frames, k)
    m = np.asarray(masks)
    assert m.min() >= 0.0 and m.max() <= 1.0
    n_interp = sum(np.size(p) for p in jax.tree_util.tree_leaves(params))
    # No parameter axis reaches n_bins: nothing learned is per-output-bin.
    assert all(max(np.shape(p)) < k
               for p in jax.tree_util.tree_leaves(params))

    _, _, params_d = build("dense")
    n_dense = sum(np.size(p) for p in jax.tree_util.tree_leaves(params_d))
    # The dense head's (F·C, S·n_bins) matrix alone outweighs the whole
    # shared trunk; the interp head replaces it with a (C, S) 1x1 conv.
    assert n_interp < 0.6 * n_dense, (n_interp, n_dense)


def test_mel_interp_matrix_partition_of_unity():
    """Each linear bin's interp weights sum to 1 and read only adjacent mel
    channels (2-tap), so the warp is exact for constant-in-mel features."""
    from gan_sass_tf_tpu.dsp.features import mel_interp_matrix

    w = mel_interp_matrix(80, 257, 8000.0)
    assert w.shape == (257, 80)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)
    assert (np.count_nonzero(w, axis=1) <= 2).all()
    # monotone: the weighted mel-index per bin is non-decreasing
    idx = w @ np.arange(80)
    assert (np.diff(idx) >= -1e-6).all()


def test_interp_head_requires_known_mode():
    cfg = config.get_config("wsj0_logmel")
    bad = cfg.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "g_head_mode": "nope"}))
    with pytest.raises(ValueError, match="g_head_mode"):
        models.build_generator(bad)


@pytest.mark.parametrize("stem,mode", [((1, 2), "conv"), ((2, 4), "conv"),
                                       ((1, 2), "fold"), ((2, 4), "fold")])
def test_conv_generator_stem_stride(stem, mode):
    """g_stem_stride runs the U-Net on a reduced grid but masks come back at
    the full (T, K) grid via the subpixel head — shapes, ranges, and grads
    must match the unstemmed contract (incl. odd T/F not divisible by the
    stride)."""
    cfg = config.get_config("music_complex_44k")
    cfg = cfg.replace(
        data=cfg.data.__class__(**{**cfg.data.__dict__,
                                   "segment_seconds": 0.1}),
        model=cfg.model.__class__(**{**cfg.model.__dict__,
                                     "g_stem_stride": stem,
                                     "g_stem_mode": mode,
                                     "g_channels": (8, 16)}),
    )
    g = models.build_generator(cfg)
    feats = _feats(cfg)
    params = g.init(jax.random.PRNGKey(0), feats)
    masks = g.apply(params, feats)
    s, k = cfg.data.num_sources, cfg.dsp.n_bins
    assert masks.shape == (2, s, cfg.num_frames, k, 2)
    assert np.abs(np.asarray(masks)).max() <= 1.0 + 1e-6

    def loss(p):
        return jnp.sum(g.apply(p, feats) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_conv_generator_decoder_slim():
    """g_decoder_slim shrinks decoder channels but the mask contract
    (shape/range) and gradient flow are unchanged."""
    cfg = config.get_config("2src_toy_cpu")
    cfg = cfg.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "generator": "conv", "g_decoder_slim": 0.5}))
    g = models.build_generator(cfg)
    feats = _feats(cfg)
    params = g.init(jax.random.PRNGKey(0), feats)
    masks = g.apply(params, feats)
    assert masks.shape == (2, cfg.data.num_sources, cfg.num_frames,
                           cfg.dsp.n_bins)
    m = np.asarray(masks)
    assert m.min() >= 0.0 and m.max() <= 1.0

    def loss(p):
        return jnp.sum(g.apply(p, feats) ** 2)

    leaves = jax.tree_util.tree_leaves(jax.grad(loss)(params))
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_conv_generator_subpixel_dec_l0():
    """g_dec_l0='subpixel' replaces the full-grid ConvTranspose + 3x3 pair
    with a half-grid 1x1 expansion + depth-to-space (the music-preset
    speed lever) — the mask contract (shape/range/grads) must be unchanged,
    including odd T/K grids that need the post-upsample crop."""
    cfg = config.get_config("music_complex_44k")
    cfg = cfg.replace(
        data=cfg.data.__class__(**{**cfg.data.__dict__,
                                   "segment_seconds": 0.1}),
        model=cfg.model.__class__(**{**cfg.model.__dict__,
                                     "g_dec_l0": "subpixel",
                                     "g_channels": (8, 16)}),
    )
    g = models.build_generator(cfg)
    feats = _feats(cfg)
    params = g.init(jax.random.PRNGKey(0), feats)
    masks = g.apply(params, feats)
    s, k = cfg.data.num_sources, cfg.dsp.n_bins
    assert masks.shape == (2, s, cfg.num_frames, k, 2)
    assert np.abs(np.asarray(masks)).max() <= 1.0 + 1e-6

    def loss(p):
        return jnp.sum(g.apply(p, feats) ** 2)

    leaves = jax.tree_util.tree_leaves(jax.grad(loss)(params))
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)

    with pytest.raises(ValueError, match="g_dec_l0"):
        bad = cfg.replace(model=cfg.model.__class__(**{
            **cfg.model.__dict__, "g_dec_l0": "nope"}))
        models.build_generator(bad)


def test_generator_grad_flow():
    cfg = config.get_config("2src_toy_cpu")
    g = models.build_generator(cfg)
    feats = _feats(cfg)
    params = g.init(jax.random.PRNGKey(0), feats)

    def loss(p):
        return jnp.sum(g.apply(p, feats) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_discriminator_logits_and_batch_stats():
    cfg = config.get_config("2src_toy_cpu")
    d = models.build_discriminator(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 129, 2))
    variables = d.init(jax.random.PRNGKey(0), x, train=False)
    assert "batch_stats" in variables  # reference's BN stack
    logits, new_state = d.apply(variables, x, train=True, mutable=["batch_stats"])
    assert logits.shape == (4,)
    assert np.isfinite(np.asarray(logits)).all()
    # batch stats actually update in train mode
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    assert any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(old, new)
    )


def test_discriminator_group_norm_stateless():
    cfg = config.get_config("2src_toy_cpu")
    cfg = cfg.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "d_norm": "group"}))
    d = models.build_discriminator(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 129, 2))
    variables = d.init(jax.random.PRNGKey(0), x, train=False)
    assert "batch_stats" not in variables
    logits = d.apply(variables, x, train=True)
    assert logits.shape == (2,)


def test_registry_unknown_names():
    cfg = config.get_config("2src_toy_cpu")
    bad = cfg.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "generator": "nope"}))
    with pytest.raises(KeyError):
        models.build_generator(bad)
    assert "conv" in models.list_generators()
    assert "conv" in models.list_discriminators()


def test_discriminator_spectral_norm():
    cfg = config.get_config("2src_toy_cpu")
    cfg = cfg.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "d_norm": "spectral"}))
    d = models.build_discriminator(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 129, 2))
    variables = d.init(jax.random.PRNGKey(0), x, train=False)
    assert "batch_stats" in variables  # power-iteration u/v vectors
    logits, new_state = d.apply(variables, x, train=True,
                                mutable=["batch_stats"])
    assert logits.shape == (2,)
    assert np.isfinite(np.asarray(logits)).all()


def test_patch_discriminator():
    cfg = config.get_config("2src_toy_cpu")
    cfg = cfg.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "discriminator": "patch"}))
    d = models.build_discriminator(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 129, 2))
    variables = d.init(jax.random.PRNGKey(0), x, train=False)
    logits = d.apply(variables, x, train=True, mutable=["batch_stats"])[0]
    assert logits.ndim == 3 and logits.shape[0] == 2  # per-patch logits
    assert np.isfinite(np.asarray(logits)).all()


def test_dropout_is_wired(rng):
    """VERDICT r1 item 4: ModelConfig.dropout must actually drop units —
    stochastic under train=True + rng, identity under train=False."""
    import jax
    import jax.numpy as jnp
    from gan_sass_tf_tpu import config, models

    base = config.get_config("2src_toy_cpu")
    cfg = base.replace(
        model=base.model.__class__(**{**base.model.__dict__,
                                      "dropout": 0.5,
                                      "g_channels": (8, 16)}),
    )
    g = models.build_generator(cfg)
    feats = jnp.asarray(rng.standard_normal((2, 16, cfg.dsp.feature_dim)),
                        jnp.float32)
    params = g.init(jax.random.PRNGKey(0), feats, train=False)
    out_det = g.apply(params, feats, train=False)
    out_a = g.apply(params, feats, train=True,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    out_b = g.apply(params, feats, train=True,
                    rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(out_a, out_b)          # stochastic across keys
    assert not np.allclose(out_a, out_det)        # differs from eval mode
    # eval mode is deterministic and needs no rng
    np.testing.assert_array_equal(
        np.asarray(out_det), np.asarray(g.apply(params, feats, train=False))
    )

    d = models.build_discriminator(cfg)
    x = jnp.asarray(rng.standard_normal((4, 16, cfg.dsp.n_bins, 2)),
                    jnp.float32)
    dvars = d.init(jax.random.PRNGKey(0), x, train=False)
    la = d.apply(dvars, x, train=True, mutable=["batch_stats"],
                 rngs={"dropout": jax.random.PRNGKey(1)})[0]
    lb = d.apply(dvars, x, train=True, mutable=["batch_stats"],
                 rngs={"dropout": jax.random.PRNGKey(2)})[0]
    assert not np.allclose(np.asarray(la), np.asarray(lb))


def test_d_input_fold_must_divide_stem_stride(rng):
    """Fold values that cannot reproduce the unfolded downsampling factor
    must be rejected (ADVICE r2 self-review), not silently change the
    architecture."""
    import jax
    import jax.numpy as jnp
    import pytest
    from gan_sass_tf_tpu import config, models

    base = config.get_config("2src_toy_cpu")
    cfg = base.replace(
        model=base.model.__class__(**{**base.model.__dict__,
                                      "d_input_fold": 4}),  # stem T-stride 2
    )
    d = models.build_discriminator(cfg)
    x = jnp.zeros((4, 8, base.dsp.n_bins, 8), jnp.float32)
    with pytest.raises(ValueError, match="divide"):
        d.init(jax.random.PRNGKey(0), x, train=False)


def test_conv_film_head_packed_position_free():
    """Conv-trunk g_head_mode='film' (round 4): the lane-packed film head
    synthesizes full-grid complex masks from the (T, K/f, f)-packed input —
    correct shapes/range, period-f position structure only (no learned
    parameter carries a per-bin or per-cell axis), and it composes with the
    fold stem (trunk at the reduced grid, no subpixel restore)."""
    cfg = config.get_config("music_complex_44k")
    cfg = cfg.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "g_head_mode": "film",
        "g_stem_mode": "fold", "g_stem_stride": (2, 2),
        "g_channels": (8, 16), "g_film_channels": 16, "g_film_fold": 8}))
    g = models.build_generator(cfg)
    feats = _feats(cfg)
    params = g.init(jax.random.PRNGKey(0), feats)
    masks = np.asarray(g.apply(params, feats))
    s, k = cfg.data.num_sources, cfg.dsp.n_bins
    assert masks.shape == (2, s, cfg.num_frames, k, 2)
    assert np.abs(masks).max() <= 1.0 + 1e-6            # tanh-bounded
    # Position-freeness: no head parameter dim is a multiple of the packed
    # cell count (ceil(K/f)) or of K — weights are shared across cells, so
    # absolute pitch cannot be memorized (period-f structure only).
    cells = -(-k // cfg.model.g_film_fold)
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    head = [(path, p) for path, p in leaves
            if any("MaskHead" in str(key) for key in path)]
    assert head, "film head params not found"
    for path, p in head:
        for d in np.shape(p):
            assert d % k != 0 and d % cells != 0, (path, np.shape(p))


def test_conv_film_head_requires_linear_grid():
    cfg = config.get_config("wsj0_logmel")   # mel frontend (80 != 257)
    bad = cfg.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "g_head_mode": "film"}))
    with pytest.raises(ValueError, match="film"):
        models.build_generator(bad)


def test_conv_film_head_gradient_flows_to_trunk():
    """The FiLM modulation is the only path from trunk to masks when the
    head is active — the trunk must still receive gradient through it."""
    cfg = config.get_config("music_complex_44k")
    cfg = cfg.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "g_head_mode": "film",
        "g_stem_mode": "fold", "g_stem_stride": (2, 2),
        "g_channels": (8, 16), "g_film_channels": 16}))
    g = models.build_generator(cfg)
    feats = _feats(cfg)
    params = g.init(jax.random.PRNGKey(0), feats)

    def loss(p):
        return jnp.sum(jnp.square(g.apply(p, feats)))

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_flatten_with_path(grads)[0]
    trunk = [np.abs(np.asarray(p)).max() for path, p in leaves
             if not any("MaskHead" in str(key) for key in path)]
    assert trunk and max(trunk) > 0.0


def test_bilstm_filmpack_head_shapes_and_position_free():
    """g_head_mode='filmpack' (bilstm): the lane-packed film head driven by
    the per-frame hidden state — same position-free family as 'film' at
    ~f x less full-grid activation traffic (the film head measured ~2x step
    time on 3src_pit)."""
    cfg = config.get_config("3src_pit")
    cfg = cfg.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "g_head_mode": "filmpack",
        "g_hidden": 32, "g_film_channels": 16}))
    g = models.build_generator(cfg)
    feats = _feats(cfg)
    params = g.init(jax.random.PRNGKey(0), feats)
    masks = np.asarray(g.apply(params, feats))
    s, k = cfg.data.num_sources, cfg.dsp.n_bins
    assert masks.shape == (2, s, cfg.num_frames, k)
    np.testing.assert_allclose(masks.sum(axis=1), 1.0, atol=1e-5)
    cells = -(-k // cfg.model.g_film_fold)
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    head = [(path, p) for path, p in leaves
            if any("MaskHead" in str(key) for key in path)]
    assert head, "filmpack head params not found"
    for path, p in head:
        for d in np.shape(p):
            assert d % k != 0 and d % cells != 0, (path, np.shape(p))


@pytest.mark.parametrize("strides,shape", [
    ((2, 2), (2, 9, 13, 5)),     # odd spatial dims exercise phase edges
    ((1, 2), (2, 8, 16, 4)),
    ((2, 2), (1, 6, 6, 3)),
])
def test_phase_convtranspose_equals_flax(strides, shape):
    """PhaseConvTranspose must be function-class EXACT vs nn.ConvTranspose:
    same params -> same outputs AND same input/kernel gradients (it exists
    only to change XLA's backward lowering, never the math)."""
    import flax.linen as nn

    from gan_sass_tf_tpu.models.phase_ct import PhaseConvTranspose

    feats = 7
    x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    phase = PhaseConvTranspose(feats, (3, 3), strides=strides)
    ref = nn.ConvTranspose(feats, (3, 3), strides=strides, padding="SAME")
    params = phase.init(jax.random.PRNGKey(2), x)
    # identical param pytree structure (kernel/bias) -> shareable
    ref_out = ref.apply(params, x)
    out = phase.apply(params, x)
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-5)

    def loss_phase(p, x):
        return jnp.sum(phase.apply(p, x) ** 2)

    def loss_ref(p, x):
        return jnp.sum(ref.apply(p, x) ** 2)

    gp, gx = jax.grad(loss_phase, argnums=(0, 1))(params, x)
    rp, rx = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4), gp, rp)


def test_phase_ct_generator_matches_default():
    """g_phase_ct=true must not change the conv G's function: same params
    (renamed ConvTranspose_i -> PhaseConvTranspose_i), same masks."""
    cfg = config.get_config("2src_toy_cpu")
    g_ref = models.build_generator(cfg)
    cfg_p = cfg.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "g_phase_ct": True}))
    g_phase = models.build_generator(cfg_p)
    feats = _feats(cfg)
    params = g_ref.init(jax.random.PRNGKey(0), feats)

    def rename(d):
        if isinstance(d, dict):
            return {k.replace("ConvTranspose_", "PhaseConvTranspose_")
                    if k.startswith("ConvTranspose_") else k: rename(v)
                    for k, v in d.items()}
        return d

    params_p = jax.tree_util.tree_map(lambda x: x, rename(params))
    m_ref = np.asarray(g_ref.apply(params, feats))
    m_phase = np.asarray(g_phase.apply(params_p, feats))
    np.testing.assert_allclose(m_phase, m_ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("stem,crop", [((1, 2), False), ((1, 2), True),
                                       ((2, 2), False)])
def test_conv_generator_fold_head(stem, crop):
    """g_head_mode='fold' (round 5): masks synthesized ON the folded grid
    (folded full-res skip, depth-to-space on the mask tensor only) — full
    (T, K) mask contract, tanh-bounded, finite grads, incl. odd T/F and
    the crop_nyquist composition."""
    cfg = config.get_config("music_complex_44k")
    cfg = cfg.replace(
        data=cfg.data.__class__(**{**cfg.data.__dict__,
                                   "segment_seconds": 0.1}),
        model=cfg.model.__class__(**{**cfg.model.__dict__,
                                     "g_stem_stride": stem,
                                     "g_stem_mode": "fold",
                                     "g_head_mode": "fold",
                                     "g_crop_nyquist": crop,
                                     "g_channels": (8, 16)}),
    )
    g = models.build_generator(cfg)
    feats = _feats(cfg)
    params = g.init(jax.random.PRNGKey(0), feats)
    masks = g.apply(params, feats)
    s, k = cfg.data.num_sources, cfg.dsp.n_bins
    assert masks.shape == (2, s, cfg.num_frames, k, 2)
    assert np.abs(np.asarray(masks)).max() <= 1.0 + 1e-6
    # NO full-grid hidden tensor: every param tensor lives on the folded
    # grid, so the largest conv kernel input channel count stays bounded
    # (the restore path would create a (st*sf*c0)-channel full-grid conv).
    def loss(p):
        return jnp.sum(g.apply(p, feats) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_fold_head_magnitude_softmax_noise_slot():
    """The fold head honors the magnitude/softmax exit incl. the discarded
    noise slot (masks sum to 1 over real sources after the slot drop —
    i.e. <= 1 with the slot absorbing the rest)."""
    cfg = config.get_config("3src_pit")
    cfg = cfg.replace(
        data=cfg.data.__class__(**{**cfg.data.__dict__,
                                   "segment_seconds": 0.2}),
        dsp=cfg.dsp.__class__(**{**cfg.dsp.__dict__,
                                 "feature": "logmag",
                                 "mask_noise_slot": True}),
        model=cfg.model.__class__(**{**cfg.model.__dict__,
                                     "generator": "conv",
                                     "g_stem_stride": (1, 2),
                                     "g_stem_mode": "fold",
                                     "g_head_mode": "fold",
                                     "g_channels": (8, 16)}),
    )
    g = models.build_generator(cfg)
    feats = _feats(cfg)
    params = g.init(jax.random.PRNGKey(0), feats)
    masks = g.apply(params, feats)
    s, k = cfg.data.num_sources, cfg.dsp.n_bins
    assert masks.shape == (2, s, cfg.num_frames, k)
    m = np.asarray(masks)
    assert m.min() >= 0.0
    # slot dropped: real-source masses sum to <= 1 everywhere
    assert (m.sum(axis=1) <= 1.0 + 1e-5).all()


def test_fold_head_requires_stem():
    cfg = config.get_config("music_complex_44k")
    bad = cfg.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "g_head_mode": "fold"}))
    with pytest.raises(ValueError, match="g_stem_stride"):
        models.build_generator(bad)
