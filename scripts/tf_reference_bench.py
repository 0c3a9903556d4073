"""Measure the CPU TensorFlow reference-pipeline training throughput.

The reference repo (`ahmedassal/GAN_SASS_TF`) publishes no benchmark numbers
(BASELINE.json:13) and its mount was empty (SURVEY.md §0), so the contract's
">10x CPU-reference training throughput per v5e chip" target needs a measured
denominator.  This script reconstructs the reference's training pipeline in
TensorFlow on CPU — tf.signal STFT frontend, conv-U-Net mask generator,
conv/BN/LeakyReLU discriminator, alternating G/D Adam updates — with the SAME
workload geometry as bench.py (wsj0-style: batch 16, 3 s @ 8 kHz, n_fft 512 /
hop 128, G channels (32,64,128), D channels (32,64,128)), and writes the
measured mixture-sec/sec into baseline_measured.json for bench.py's
vs_baseline.

Run once per environment:  python scripts/tf_reference_bench.py
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

import numpy as np
import tensorflow as tf

SR = 8000
SEG_SEC = 3.0
BATCH = 16
N_FFT, HOP = 512, 128
N_SRC = 2
G_CH = (32, 64, 128)
D_CH = (32, 64, 128)
WARMUP, STEPS = 2, 5


class Generator(tf.keras.Model):
    """Conv U-Net mask net (subclassed: Keras 3 functional API forbids raw
    tf ops on symbolic tensors)."""

    def __init__(self):
        super().__init__()
        self.enc_a, self.enc_b, self.dec_t, self.dec_c = [], [], [], []
        for c in G_CH:
            self.enc_a.append(tf.keras.layers.Conv2D(c, 3, padding="same"))
            self.enc_b.append(
                tf.keras.layers.Conv2D(c, 3, strides=(1, 2), padding="same")
            )
        self.mid = tf.keras.layers.Conv2D(G_CH[-1], 3, padding="same")
        for c in reversed(G_CH):
            self.dec_t.append(
                tf.keras.layers.Conv2DTranspose(c, 3, strides=(1, 2),
                                                padding="same")
            )
            self.dec_c.append(tf.keras.layers.Conv2D(c, 3, padding="same"))
        self.head = tf.keras.layers.Conv2D(N_SRC, 1, activation="sigmoid")
        self.act = tf.keras.layers.LeakyReLU(0.2)

    def call(self, x, training=False):
        skips = []
        for a, b in zip(self.enc_a, self.enc_b):
            x = self.act(a(x))
            skips.append(x)
            x = self.act(b(x))
        x = self.act(self.mid(x))
        for t_lyr, c_lyr, skip in zip(self.dec_t, self.dec_c, reversed(skips)):
            x = self.act(t_lyr(x))
            x = x[:, :, : tf.shape(skip)[2], :]
            x = tf.concat([x, skip], axis=-1)
            x = self.act(c_lyr(x))
        return self.head(x)


class Discriminator(tf.keras.Model):
    def __init__(self):
        super().__init__()
        self.convs, self.norms = [], []
        for i, c in enumerate(D_CH):
            self.convs.append(
                tf.keras.layers.Conv2D(c, 4, strides=2, padding="same")
            )
            self.norms.append(
                tf.keras.layers.BatchNormalization() if i > 0 else None
            )
        self.act = tf.keras.layers.LeakyReLU(0.2)
        self.dense = tf.keras.layers.Dense(1)

    def call(self, x, training=False):
        for conv, norm in zip(self.convs, self.norms):
            x = conv(x)
            if norm is not None:
                x = norm(x, training=training)
            x = self.act(x)
        x = tf.reduce_mean(x, axis=[1, 2])
        return self.dense(x)


def main() -> None:
    t_seg = int(SEG_SEC * SR)
    n_bins = N_FFT // 2 + 1
    g = Generator()
    d = Discriminator()
    g_opt = tf.keras.optimizers.Adam(2e-4, beta_1=0.5)
    d_opt = tf.keras.optimizers.Adam(2e-4, beta_1=0.5)
    mse = tf.keras.losses.MeanSquaredError()

    rng = np.random.default_rng(0)
    sources = rng.standard_normal((BATCH, N_SRC, t_seg)).astype(np.float32)

    @tf.function
    def train_step(sources):
        mixture = tf.reduce_sum(sources, axis=1)
        spec_mix = tf.signal.stft(mixture, N_FFT, HOP, N_FFT)
        feats = tf.math.log(tf.abs(spec_mix) + 1e-8)[..., None]
        tgt_spec = tf.signal.stft(
            tf.reshape(sources, [-1, t_seg]), N_FFT, HOP, N_FFT
        )
        tgt_mag = tf.math.log(tf.abs(tgt_spec) + 1e-8)
        tgt_mag = tf.reshape(
            tgt_mag, [BATCH, N_SRC, tf.shape(tgt_mag)[1], n_bins]
        )

        def g_forward():
            masks = g(feats, training=True)                     # B,T,K,S
            masks = tf.transpose(masks, [0, 3, 1, 2])            # B,S,T,K
            est = tf.cast(masks, tf.complex64) * spec_mix[:, None]
            est_mag = tf.math.log(tf.abs(est) + 1e-8)
            return est_mag

        def d_input(cand):
            mix_b = tf.broadcast_to(
                tf.math.log(tf.abs(spec_mix) + 1e-8)[:, None], tf.shape(cand)
            )
            x = tf.stack([mix_b, cand], -1)
            return tf.reshape(
                x, [BATCH * N_SRC, tf.shape(x)[2], n_bins, 2]
            )

        with tf.GradientTape() as tape_d:
            est_mag = tf.stop_gradient(g_forward())
            logits = d(
                tf.concat([d_input(tgt_mag), d_input(est_mag)], 0),
                training=True,
            )
            real, fake = tf.split(logits, 2)
            d_loss = 0.5 * (mse(tf.ones_like(real), real) + mse(
                tf.zeros_like(fake), fake))
        d_grads = tape_d.gradient(d_loss, d.trainable_variables)
        d_opt.apply_gradients(zip(d_grads, d.trainable_variables))

        with tf.GradientTape() as tape_g:
            est_mag = g_forward()
            rec = tf.reduce_mean(tf.abs(est_mag - tgt_mag))
            fake_logits = d(d_input(est_mag), training=True)
            adv = 0.5 * mse(tf.ones_like(fake_logits), fake_logits)
            g_loss = adv + 100.0 * rec
        g_grads = tape_g.gradient(g_loss, g.trainable_variables)
        g_opt.apply_gradients(zip(g_grads, g.trainable_variables))
        return d_loss, g_loss

    for _ in range(WARMUP):
        train_step(tf.constant(sources))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        d_loss, g_loss = train_step(tf.constant(sources))
    elapsed = time.perf_counter() - t0
    throughput = STEPS * BATCH * SEG_SEC / elapsed
    result = {
        "cpu_tf_reference_mixture_sec_per_sec": round(throughput, 2),
        "workload": {
            "batch": BATCH, "segment_sec": SEG_SEC, "sample_rate": SR,
            "n_fft": N_FFT, "hop": HOP, "g_channels": list(G_CH),
            "d_channels": list(D_CH), "steps_timed": STEPS,
        },
        "losses_at_end": {"d": float(d_loss), "g": float(g_loss)},
    }
    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "baseline_measured.json")
    with open(os.path.abspath(out_path), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
