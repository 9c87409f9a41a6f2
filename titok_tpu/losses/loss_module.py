"""Reconstruction + adversarial loss system (reference
``model/losses/loss_module.py``) over packed buffers.

Generator loss (ref ``loss_module.py:111-163``):
  per-sample L1 (equal weight per clip regardless of size, ``:118,155-160``)
  + LPIPS + Gram over K randomly cropped frames (``:123-137``)
  + relativistic GAN ``softplus(-(fake - real))`` with frozen disc (``:141-153``).

Discriminator loss (ref ``loss_module.py:166-214``):
  ``softplus(-(real - fake))`` (``:177-180``)
  + finite-difference R1/R2 gradient penalty: re-run the disc on
  noise-perturbed inputs and penalize ``(logits - logits_noised)²`` weighted
  ``gp_weight / gp_noise²`` (``:186-198``, per arXiv 2509.24935)
  + centering loss ``((real + fake)²)/2`` (``:201-204``).

The discriminator is a :class:`PackedEncoder` with ``out_channels=1`` and 4
register tokens per sample; logits are the mean over its token outputs
(``:42-48,96-101``).

TPU-first notes: all reductions are ``segment_sum`` over the packed axis
(per-sample means with static shapes); gradient isolation is free in JAX —
the generator loss differentiates w.r.t. generator params only, and the
disc loss takes a ``stop_gradient``'d reconstruction, replacing the
reference's ``requires_grad`` toggling (``:145-147,169-175``). All five disc
forwards of a train step batch through the same jitted program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from titok_tpu.losses.lpips import LPIPS
from titok_tpu.models.blocks import PackedEncoder
from titok_tpu.ops.frames import extract_perceptual_frames
from titok_tpu.ops.patchify import decode_rows


def _per_sample_mean(values_rows, segment_ids, row_mask, num_segments):
    """Masked per-segment mean of per-row scalars -> [num_segments-1]
    (drops segment 0 = padding)."""
    w = row_mask.astype(jnp.float32)
    sums = jax.ops.segment_sum(values_rows * w, segment_ids, num_segments)
    cnts = jax.ops.segment_sum(w, segment_ids, num_segments)
    return (sums / jnp.maximum(cnts, 1.0))[1:]


def _masked_mean(x, mask):
    m = mask.astype(jnp.float32)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


class LossSystem:
    """Bundles the disc/LPIPS modules with the loss math.

    Pure-functional: parameters are passed into every call, so the whole
    thing jits inside the train step.
    """

    def __init__(self, config, cp_mesh=None, cp_axis: str = "seq",
                 tp_mesh=None, tp_axis: str = "model"):
        loss_c = config.tokenizer.losses
        loss_d = config.discriminator.losses
        model_d = config.discriminator.model

        self.perceptual_weight = float(loss_c.perceptual_weight)
        self.gram_weight = float(loss_c.gram_weight)
        self.disc_weight = float(loss_c.disc_weight)
        self.gp_weight = float(loss_d.gp_weight)
        self.gp_noise = float(loss_d.gp_noise)
        self.centering_weight = float(loss_d.centering_weight)

        self.sample_size = int(loss_c.perceptual_sampling_size)
        n_perc = int(loss_c.perceptual_samples_per_step)
        if n_perc == -1:  # ref: sample all frames; static worst case here
            from titok_tpu.data.packing import max_samples_for

            cs = config.training.sampling
            bmax = max_samples_for(
                int(cs.train_seq_len), cs.min_grid,
                config.tokenizer.model.patch_size, cs.token_range[0],
            )
            self.num_frames = int(cs.max_grid[0]) * bmax
        else:
            self.num_frames = n_perc + 1  # ref keeps K+1 (loss_module.py:90-93)
        self.patch_size = tuple(config.tokenizer.model.patch_size)
        self.use_perceptual = self.perceptual_weight > 0 or self.gram_weight > 0
        self.use_disc = self.disc_weight > 0

        assert tuple(model_d.patch_size) == self.patch_size, (
            "disc patch_size must equal tokenizer patch_size in the packed "
            "pipeline (both read the same patch rows)"
        )

        self.disc_tokens = 4  # register tokens (ref loss_module.py:42)
        self.lpips = LPIPS()
        from titok_tpu.models.titok import _config_max_seg_len

        self.disc_model = PackedEncoder(
            model_size=model_d.model_size,
            patch_size=self.patch_size,
            in_channels=3,
            out_channels=1,
            attn_impl=str(config.training.main.get("attn_impl", "auto")),
            max_seg_len=_config_max_seg_len(config),
            cp_mesh=cp_mesh,
            cp_axis=cp_axis,
            tp_mesh=tp_mesh,
            tp_axis=tp_axis,
            # the stacked disc pass dominates HBM at base scale (its packed
            # axis is n_forwards x seq): honor training.main.remat here too
            # (base @ S=12288 OOM'd 17.1G/15.75G with only the tokenizer
            # remat'd — the top 20 allocations were all disc activations)
            remat=bool(config.training.main.get("remat", False)),
        )

    # -- discriminator plumbing -------------------------------------------
    def _disc_rows(self, patch_rows, disc):
        """Regather tokenizer patch rows into disc slot layout [Sd, P]."""
        x = patch_rows[disc["patch_gather"]]
        return jnp.where(disc["is_patch"][:, None], x, 0.0)

    def disc_logits(self, disc_params, rows_d, disc):
        """Disc forward -> per-sample mean over register-token outputs
        (ref ``disc_wrapper``, loss_module.py:96-101)."""
        out = self.disc_model.apply(
            {"params": disc_params}, rows_d, disc["token_mask"],
            disc["segment_ids"], disc["rope_cos"], disc["rope_sin"],
        )[:, 0]
        B1 = disc["sample_valid"].shape[0] + 1
        return _per_sample_mean(
            out.astype(jnp.float32), disc["segment_ids"], disc["token_mask"], B1
        )

    def disc_logits_stacked(self, disc_params, rows_list, disc):
        """All n disc forwards of a step as ONE packed forward.

        The reference runs up to 4 separate discriminator passes per step
        (real/fake + the two noise-perturbed R1/R2 passes,
        loss_module.py:177-191). Packing is already how this framework
        batches variable content, so the n inputs are concatenated along
        the sequence axis with per-copy segment-id offsets: one kernel
        launch, n× the effective batch, identical math (block-diagonal
        attention keeps copies independent). Returns ``[n, Bmax]`` logits.
        """
        n = len(rows_list)
        if n == 1:
            return self.disc_logits(disc_params, rows_list[0], disc)[None]
        Bmax = disc["sample_valid"].shape[0]
        B1 = Bmax + 1
        # INVARIANT: the flash kernel's block-skip compression requires
        # segment ids to be non-decreasing along the buffer. Each copy's
        # layout is [samples..., pads], so give copy c's pads the id right
        # AFTER its samples (c*stride + B1) instead of 0 — pads still only
        # attend pads of their own copy, and the stacked vector stays sorted.
        stride = B1 + 1
        seg = disc["segment_ids"]
        segs = jnp.concatenate(
            [jnp.where(seg > 0, seg + c * stride, B1 + c * stride)
             for c in range(n)]
        )
        rows = jnp.concatenate(rows_list, axis=0)
        tmask = jnp.tile(disc["token_mask"], n)
        cos = jnp.tile(disc["rope_cos"], (n, 1))
        sin = jnp.tile(disc["rope_sin"], (n, 1))

        out = self.disc_model.apply(
            {"params": disc_params}, rows, tmask, segs, cos, sin,
        )[:, 0]
        all_means = _per_sample_mean(out.astype(jnp.float32), segs, tmask,
                                     n * stride + 1)
        # segment c*stride + b (b in 1..Bmax) -> flat index c*stride + b - 1
        # after dropping segment 0; the pad segment (b = B1) lands just past
        # each copy's slice
        return jnp.stack(
            [jax.lax.dynamic_slice(all_means, (c * stride,), (Bmax,))
             for c in range(n)]
        )

    # -- generator loss ----------------------------------------------------
    def generator_loss(
        self,
        lpips_params,
        disc_params,
        recon_rows,   # [S, P] decoder output
        batch,        # PackedBatch device arrays
        disc,         # DiscBatch device arrays (or None)
        perc,         # PerceptualPlan device arrays (or None)
    ):
        target_rows = decode_rows(batch["patches"], jnp.float32)
        recon_f = recon_rows.astype(jnp.float32)
        seg = batch["segment_ids"]
        patch_mask = (~batch["token_mask"]) & (seg > 0)
        B1 = batch["sample_valid"].shape[0] + 1
        valid = batch["sample_valid"]

        loss_dict = {}
        l1_rows = jnp.abs(recon_f - target_rows).mean(axis=-1)
        recon_loss = _per_sample_mean(l1_rows, seg, patch_mask, B1)  # [Bmax]
        loss_dict["recon_loss"] = _masked_mean(recon_loss, valid)

        perceptual_loss = 0.0
        gram_loss = 0.0
        if self.use_perceptual and perc is not None:
            tgt_frames = extract_perceptual_frames(
                target_rows, perc, self.patch_size, self.sample_size
            )
            rec_frames = extract_perceptual_frames(
                jnp.clip(recon_f, -1.0, 1.0), perc, self.patch_size,
                self.sample_size,
            )
            lp, gr = self.lpips.apply({"params": lpips_params}, rec_frames, tgt_frames)
            w = perc["weight"]
            denom = jnp.maximum(w.sum(), 1.0)
            perceptual_loss = (lp * w).sum() / denom
            gram_loss = (gr * w).sum() / denom
            if self.perceptual_weight > 0:
                loss_dict["perceptual_loss"] = perceptual_loss
            if self.gram_weight > 0:
                loss_dict["gram_loss"] = gram_loss

        g_loss_mean = 0.0
        if self.use_disc and disc is not None:
            # disc params are frozen here simply by not differentiating them
            real, fake = self.disc_logits_stacked(
                disc_params,
                [self._disc_rows(jax.lax.stop_gradient(target_rows), disc),
                 self._disc_rows(recon_f, disc)],
                disc,
            )
            g_loss = jax.nn.softplus(-(fake - real))
            g_loss_mean = _masked_mean(g_loss, valid)
            loss_dict["g_loss"] = g_loss_mean

        total = (
            _masked_mean(recon_loss, valid)
            + self.perceptual_weight * perceptual_loss
            + self.gram_weight * gram_loss
            + self.disc_weight * g_loss_mean
        )
        loss_dict["total_loss"] = total
        return total, {"gen/" + k: v for k, v in loss_dict.items()}

    # -- discriminator loss -------------------------------------------------
    def discriminator_loss(
        self,
        disc_params,
        recon_rows,   # [S, P] (already stop-gradient'd by the caller)
        batch,
        disc,
        rng,
    ):
        target_rows = decode_rows(batch["patches"], jnp.float32)
        recon_f = recon_rows.astype(jnp.float32)
        valid = batch["sample_valid"]
        loss_dict = {}

        rows_real = self._disc_rows(target_rows, disc)
        rows_fake = self._disc_rows(recon_f, disc)

        # all 2 (or 4 with R1/R2) disc forwards as one packed pass
        rows_list = [rows_real, rows_fake]
        if self.gp_weight > 0:
            noise = (
                jax.random.normal(rng, rows_real.shape, jnp.float32) * self.gp_noise
            )
            noise = jnp.where(disc["is_patch"][:, None], noise, 0.0)
            rows_list += [rows_real + noise, rows_fake + noise]
        logits = self.disc_logits_stacked(disc_params, rows_list, disc)
        logits_real, logits_fake = logits[0], logits[1]

        logits_relative = logits_real - logits_fake
        d_loss = jax.nn.softplus(-logits_relative)
        loss_dict["d_loss"] = _masked_mean(d_loss, valid)
        loss_dict["logits_relative"] = _masked_mean(logits_relative, valid)

        gradient_penalty = 0.0
        if self.gp_weight > 0:
            logits_real_n, logits_fake_n = logits[2], logits[3]
            r1 = (logits_real - logits_real_n) ** 2
            r2 = (logits_fake - logits_fake_n) ** 2
            loss_dict["r1_penalty"] = _masked_mean(r1, valid)
            loss_dict["r2_penalty"] = _masked_mean(r2, valid)
            gradient_penalty = r1 + r2

        centering = 0.0
        if self.centering_weight > 0:
            centering = ((logits_real + logits_fake) ** 2) / 2
            loss_dict["centering_loss"] = _masked_mean(centering, valid)

        total = _masked_mean(
            d_loss
            + (self.gp_weight / self.gp_noise**2) * gradient_penalty
            + self.centering_weight * centering,
            valid,
        )
        loss_dict["total_loss"] = total
        return total, {"disc/" + k: v for k, v in loss_dict.items()}

    # -- init ---------------------------------------------------------------
    def init_disc_params(self, rng, batch, disc):
        rows = self._disc_rows(decode_rows(batch["patches"], jnp.float32), disc)
        return self.disc_model.init(
            rng, rows, disc["token_mask"], disc["segment_ids"],
            disc["rope_cos"], disc["rope_sin"],
        )["params"]
