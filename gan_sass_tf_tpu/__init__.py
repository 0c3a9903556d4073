"""gan_sass_tf_tpu — TPU-native GAN speech/audio source separation framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the
TensorFlow reference `ahmedassal/GAN_SASS_TF` (see SURVEY.md; the binding
capability contract is BASELINE.json:5).  The audio frontend (framing,
windowed STFT/iSTFT, log-magnitude/log-mel spectrograms, mask application,
overlap-add resynthesis) runs on device — fused Pallas kernels on TPU with a
pure-XLA oracle path — the spectral-masking generator and conv/BN/LeakyReLU
discriminator compile to XLA, and the alternating G/D adversarial train step
runs data-parallel via sharded jit over an ICI mesh.

Public surface:
    from gan_sass_tf_tpu import config, dsp, models, losses, train, infer
    cfg = config.get_config("2src_toy_cpu")
    exp = train.Experiment(cfg)
    exp.train(num_steps=...)
    wavs = infer.separate(exp.state, cfg, mixture_wav)
"""

__version__ = "0.1.0"

from gan_sass_tf_tpu import config  # noqa: F401
