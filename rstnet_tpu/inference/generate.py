"""Streaming frame-step generation engine (LMGen).

Capability parity with ``MLLM_v2/models/model.py:432-597`` (LMGen / _LMGenState
/ depformer_step): a delay-pattern ring cache ``[B, K, max_delay+2]`` holds
recent tokens per stream; user streams are written at delayed positions; each
80 ms frame runs one backbone step plus ``dep_q`` sequential depformer
micro-steps with per-modality sampling (text temp/top-k vs audio), and a
complete token frame is emitted once ``offset > max_delay``.

TPU-first: the entire frame step — ring writes, backbone step, 8 unrolled
depformer micro-steps, sampling, output gather — is ONE jitted function over
explicit state, compiled once with static shapes (the XLA equivalent of the
reference's two CUDA graphs), with no host round-trips inside the frame.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from rstnet_tpu.core import Params, State
from rstnet_tpu.models.lm import SpeechTextLM, UNGENERATED_TOKEN_ID
from rstnet_tpu.ops.pallas_depformer import (
    depformer_kernel_operands,
    depformer_step_pallas,
    pallas_depformer_mode,
)
from rstnet_tpu.ops.sampling import sample_token


@dataclasses.dataclass(frozen=True)
class LMGen:
    model: SpeechTextLM
    delays: tuple[int, ...] = ()  # len 1+n_q; default all-zero
    use_sampling: bool = True
    temp: float = 0.8
    temp_text: float = 0.7
    top_k: int = 250
    top_k_text: int = 25
    # ban special ids >= audio_card when sampling audio (reference
    # sample_token_audio semantics); None disables the clamp
    audio_max_card: Optional[int] = None
    # store the backbone ring K/V as int8 with per-step scales: half the
    # cache memory and attention HBM traffic per frame (serving option)
    kv_int8: bool = False
    # one donated ring buffer per layer instead of a stacked [L, ...] array:
    # cache updates alias in place, eliminating the stacked layout's
    # per-layer slab copies (unrolled) / whole-cache double buffer (rolled)
    # — the large-batch 8B serving option (models/backbone.py init_state)
    kv_unstacked: bool = False

    def __post_init__(self):
        if not self.delays:
            object.__setattr__(self, "delays", (0,) * self.model.num_codebooks)
        assert len(self.delays) == self.model.num_codebooks

    @property
    def max_delay(self) -> int:
        return max(self.delays)

    @property
    def cache_len(self) -> int:
        return self.max_delay + 2

    @property
    def num_user_streams(self) -> int:
        """Streams supplied by the caller (0 for pretraining configs where
        n_q == dep_q; 8 for duplex Moshi-style configs)."""
        return self.model.num_codebooks - self.model.config.dep_q - 1

    def init_state(self, batch_size: int, dtype=jnp.bfloat16) -> State:
        K = self.model.num_codebooks
        return {
            "cache": jnp.full(
                (batch_size, K, self.cache_len), UNGENERATED_TOKEN_ID, jnp.int32
            ),
            "offset": jnp.zeros((), jnp.int32),
            # per-slot frame count: lets independent sessions share one
            # batched decode step (multi-session serving). A slot's age
            # bounds its attention lookback (min_pos), drives its own
            # delay-warmup, and is zeroed by reset_slots on session join.
            "age": jnp.zeros((batch_size,), jnp.int32),
            "lm": self.model.init_state(
                batch_size, dtype, kv_int8=self.kv_int8,
                kv_unstacked=self.kv_unstacked,
            ),
        }

    def reset_slots(self, state: State, slots) -> State:
        """Reset batch slots for new sessions (multi-session serving).

        ``slots``: int index array/list. Clears the slots' delay-cache rows
        and zeroes their age; the LM ring KV needs no clearing because the
        per-slot ``min_pos`` mask hides all keys older than the slot's age.
        """
        slots = jnp.asarray(slots, jnp.int32)
        return {
            **state,
            "cache": state["cache"].at[slots].set(UNGENERATED_TOKEN_ID),
            "age": state["age"].at[slots].set(0),
        }

    def step(
        self,
        params: Params,
        state: State,
        key: jax.Array,
        input_tokens: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array, State]:
        """One frame step.

        input_tokens: [B, num_user_streams, 1] (omit when no user streams).
        Returns (frame [B, dep_q+1, 1], valid [B] bool, state). A slot's
        frame holds UNGENERATED during its max_delay warmup (valid=False).
        Slots are independent sessions: each has its own age (warmup and
        attention lookback), so a batched serving loop can join/leave
        sessions with ``reset_slots`` without disturbing the others.
        """
        model = self.model
        cfg = model.config
        cache = state["cache"]
        offset = state["offset"]
        age = state["age"]  # [B]
        B, K, CT = cache.shape
        delays = jnp.asarray(self.delays, jnp.int32)

        # 1. write user streams at their delayed positions
        if self.num_user_streams:
            assert input_tokens is not None and input_tokens.shape[1] == self.num_user_streams
            ks = jnp.arange(self.num_user_streams) + cfg.dep_q + 1
            write_pos = (offset + delays[ks]) % CT  # [U]
            cache = cache.at[:, ks, write_pos].set(input_tokens[:, :, 0])

        # 2. at the start of a slot's session, delayed streams read the
        # initial token (per-slot: age, not the global offset)
        position = offset % CT
        initial = jnp.broadcast_to(model.initial_frame(B)[:, :, 0], (B, K))
        use_initial = age[:, None] <= delays[None, :]  # [B, K]
        current = cache[:, :, position]
        current = jnp.where(use_initial, initial, current)
        cache = cache.at[:, :, position].set(current)

        # 3. backbone step on the current frame; min_pos hides ring-cache
        # keys written before each slot's session started
        frame = current[:, :, None]  # [B, K, 1]
        hidden, text_logits, lm_state = model.step_global(
            params, state["lm"], frame, min_pos=offset - age
        )
        key, k_text = jax.random.split(key)
        text_token = sample_token(
            k_text, text_logits[:, 0], self.use_sampling, self.temp_text, self.top_k_text
        )  # [B]

        # 4. depformer micro-steps (static unroll over dep_q). The
        # per-codebook input views are one hoisted matmul, not 8.
        dep_ins = model.codecformer_inputs(params, hidden)  # [B, dep_q, 1, C]
        dep_ops = None
        dep_mode = pallas_depformer_mode()
        if dep_mode is not None and B == 1:
            # fused micro-step megakernel (ops/pallas_depformer.py): one
            # pallas_call per codebook instead of ~50 tiny XLA kernels;
            # None when the config is outside the kernel envelope
            dep_ops = depformer_kernel_operands(model, params)
        prev = text_token[:, None]
        audio_tokens = []
        if dep_ops is not None:
            kc = jnp.zeros(
                (dep_ops["L"], dep_ops["S"], dep_ops["C"]), hidden.dtype
            )
            vc = jnp.zeros_like(kc)
            for cb in range(cfg.dep_q):
                emb = model.codecformer_step_embedding(params, cb, prev)
                x = (dep_ins[:, cb, 0] + emb[:, 0]).astype(jnp.bfloat16)
                logits, kc, vc = depformer_step_pallas(
                    x, cb,
                    dep_ops["norm1"], dep_ops["in_proj"], dep_ops["out_proj"],
                    dep_ops["norm2"], dep_ops["gin"], dep_ops["gout"],
                    dep_ops["head_w"], dep_ops["head_b"], kc, vc,
                    heads=dep_ops["heads"], eps=dep_ops["eps"],
                    scales=dep_ops["scales"],
                    interpret=dep_mode == "interpret",
                )
                key, k_cb = jax.random.split(key)
                tok = sample_token(
                    k_cb, logits, self.use_sampling, self.temp, self.top_k,
                    max_card=self.audio_max_card,
                )
                prev = tok[:, None]
                audio_tokens.append(tok)
        else:
            cf_state = model.init_codecformer_state(B, dtype=hidden.dtype)
            for cb in range(cfg.dep_q):
                logits, cf_state = model.step_codecformer(
                    params, cf_state, cb, prev, hidden, dep_in=dep_ins[:, cb]
                )
                key, k_cb = jax.random.split(key)
                tok = sample_token(
                    k_cb, logits[:, 0], self.use_sampling, self.temp, self.top_k,
                    max_card=self.audio_max_card,
                )
                prev = tok[:, None]
                audio_tokens.append(tok)
        audio = jnp.stack(audio_tokens, axis=1)  # [B, dep_q]

        # 5. write generated tokens at the next position
        offset = offset + 1
        age = age + 1
        position = offset % CT
        cache = cache.at[:, 0, position].set(text_token)
        cache = cache.at[:, 1 : cfg.dep_q + 1, position].set(audio)

        # 6. gather the delayed output frame
        gen_delays = delays[: cfg.dep_q + 1]
        index = (offset - self.max_delay + gen_delays) % CT  # [dep_q+1]
        out = jnp.take_along_axis(
            cache[:, : cfg.dep_q + 1, :],
            jnp.broadcast_to(index[None, :, None], (B, cfg.dep_q + 1, 1)),
            axis=2,
        )
        valid = age > self.max_delay  # [B]
        new_state = {"cache": cache, "offset": offset, "age": age, "lm": lm_state}
        return out, valid, new_state

    def step_scan(
        self,
        params: Params,
        state: State,
        key: jax.Array,
        input_tokens: Optional[jax.Array] = None,
        n_frames: Optional[int] = None,
    ) -> tuple[jax.Array, jax.Array, State]:
        """N frame steps in ONE dispatch (``lax.scan`` over :meth:`step`).

        input_tokens: [B, num_user_streams, N] (or None when no user
        streams, with ``n_frames`` giving N). Returns (frames
        [B, dep_q+1, N], valid [B, N], state) — token-identical to N
        :meth:`step` calls with the keys ``jax.random.split(key, N)``.

        Serving uses this when the session buffer holds several pending
        frames (file streaming, offline generation, catch-up after a
        stall): per-dispatch overhead — which dominates the per-call
        amortized latency on a remotely-attached chip — is paid once per N
        frames instead of once per frame. The depformer megakernel and the
        backbone compile once inside the scan body (vs N unrolled copies).
        """
        if input_tokens is not None:
            n = input_tokens.shape[-1]
            inputs = jnp.moveaxis(input_tokens[..., None], 2, 0)  # [N, B, U, 1]
        else:
            assert n_frames is not None, "n_frames required without user streams"
            n = n_frames
            inputs = None
        keys = jax.random.split(key, n)

        def body(st, xs):
            if inputs is None:
                k = xs
                out, valid, st = self.step(params, st, k)
            else:
                k, tok = xs
                out, valid, st = self.step(params, st, k, tok)
            return st, (out[..., 0], valid)

        xs = keys if inputs is None else (keys, inputs)
        state, (outs, valids) = jax.lax.scan(body, state, xs)
        # [N, B, dep_q+1] -> [B, dep_q+1, N]; [N, B] -> [B, N]
        return jnp.moveaxis(outs, 0, 2), valids.T, state
