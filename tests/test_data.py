"""Data layer tests: delay-pattern golden parity vs reference collate,
token-budget batching, sampler determinism, manifest loading."""

import json

import numpy as np
import pytest

from rstnet_tpu.data.collate import Collator, SpecialTokens, bucket_length, default_buckets
from rstnet_tpu.data.dataloader import (
    SyncSampler,
    batchfy,
    build_data_iterator,
    find_data_jsons,
)


class StubTokenizer:
    def tokenize2(self, x):
        return np.asarray(x, np.int64)

    def find_length(self, x):
        return int(np.shape(x)[-1])


TOKENIZERS = {"text": StubTokenizer(), "audio": StubTokenizer()}


def _mk_collator(**kw):
    return Collator(TOKENIZERS, max_length=64, delay_step=1, parallel_number=9, **kw)


def test_delay_shapes_and_pattern():
    c = _mk_collator()
    grid = np.arange(9 * 5).reshape(9, 5)
    weight = np.ones((9, 5), np.float32)
    out, w = c.delay(grid, weight)
    assert out.shape == (9, 6)
    np.testing.assert_array_equal(out[0, :5], grid[0])
    assert out[0, 5] == c.sp.text_empty
    np.testing.assert_array_equal(out[1, :5], grid[1])
    assert out[1, 5] == c.sp.semantic_empty
    for r in range(2, 9):
        assert out[r, 0] == c.sp.acoustic_empty
        np.testing.assert_array_equal(out[r, 1:], grid[r])
    # reverse round-trips
    rec = c.reverse_delay(out)
    np.testing.assert_array_equal(rec, grid)


def test_collate_golden_vs_reference(torch_reference):
    """Full batch collation matches the reference Collate_Fn_Factory."""
    torch = torch_reference
    # the reference dataloader imports optional audio deps at module level;
    # stub the ones absent from this environment (cumulatively — other test
    # files stub the same names with different attribute subsets), and make
    # sure top-level `utils` resolves against MLLM_v2 even if another test
    # in this worker imported the GLM4V tree (whose utils.py shadows it)
    from tests.refpath import MLLM_V2_ROOT, ensure_reference_root, stub_module

    stub_module("omegaconf", OmegaConf=object)
    stub_module("torchaudio")
    ensure_reference_root(MLLM_V2_ROOT)
    from utils.dataloader import Collate_Fn_Factory

    class TorchStub:
        def tokenize2(self, x):
            return torch.as_tensor(np.asarray(x)).long()

        def find_length(self, x):
            return int(np.shape(x)[-1])

    rng = np.random.default_rng(0)
    items = []
    for i in range(3):
        T = int(rng.integers(4, 10))
        if i == 0:
            d = {"task": "text_only", "text_seq": rng.integers(0, 1000, (T,))}
        elif i == 1:
            d = {"task": "audio_only", "audio_seq": rng.integers(0, 2048, (8, T))}
        else:
            d = {
                "task": "word_level_audio_text_alignment",
                "text_seq": rng.integers(0, 1000, (1, T)),  # stored [1, T]
                "audio_seq": rng.integers(0, 2048, (8, T)),
            }
        items.append((f"utt{i}", d))

    ref_collate = Collate_Fn_Factory(
        tokenizers={"text": TorchStub(), "audio": TorchStub()},
        max_length=64, delay_step=1, parallel_number=9,
    )
    seq_ref, mask_ref, lengths_ref, ids_ref = ref_collate([items])

    mine = _mk_collator()
    out = mine(items)
    Tref = seq_ref.shape[-1]
    np.testing.assert_array_equal(out["tokens"][:, :, :Tref], seq_ref.numpy())
    np.testing.assert_allclose(out["masks"][:, :, :Tref], mask_ref.numpy(), atol=1e-6)
    np.testing.assert_array_equal(out["lengths"], lengths_ref.numpy())
    assert out["example_ids"] == ids_ref
    # bucket padding beyond the reference length is pad tokens with zero mask
    assert (out["masks"][:, :, Tref:] == 0).all()
    assert (out["tokens"][:, 0, Tref:] == mine.sp.text_pad).all()
    assert (out["tokens"][:, 2:, Tref:] == mine.sp.acoustic_pad).all()


def test_interleaved_task_collate():
    c = _mk_collator()
    rng = np.random.default_rng(1)
    d = {
        "task": "setence_level_text_audio_interleaved",
        "text_seq": rng.integers(0, 100, (4,)),
        "audio_seq": rng.integers(0, 2048, (8, 6)),
    }
    grid, weight = c.splice(d)
    assert grid.shape == (9, 10)
    # text block first: audio rows empty with down-weighted mask
    assert (grid[1, :4] == c.sp.semantic_empty).all()
    np.testing.assert_allclose(weight[1:, :4], 1.0 / (4 * 8))
    # audio block: text row empty, weight 1/T_audio
    assert (grid[0, 4:] == c.sp.text_empty).all()
    np.testing.assert_allclose(weight[0, 4:], 1.0 / 6)


def test_buckets():
    buckets = default_buckets(1000)
    assert bucket_length(1, buckets) == 64
    assert bucket_length(65, buckets) == 96
    assert bucket_length(10**6, buckets) == buckets[-1]
    assert all(b2 > b1 for b1, b2 in zip(buckets, buckets[1:]))


def test_batchfy_budget_and_text_mixing():
    data = {f"a{i}": {"length": 10 + i, "task": "audio_only"} for i in range(20)}
    text = {f"t{i}": {"length": 5, "task": "text_only"} for i in range(10)}
    batches = batchfy(data, list(data), text, list(text), batch_scale=50)
    assert sum(len(b) for b in batches) >= 20
    # every completed batch (all but possibly the last) mixes in text
    for b in batches[:-1]:
        assert any(u.startswith("t") for u in b), b


def test_sampler_determinism_and_epochs():
    s1 = SyncSampler(17, seed=3)
    s2 = SyncSampler(17, seed=3)
    assert list(s1) == list(s2)
    first = list(s1)
    s1.refresh()
    assert list(s1) != first  # new epoch, new order
    assert sorted(first) == list(range(17))


def test_end_to_end_iterator(tmp_path):
    rng = np.random.default_rng(0)
    audio = {f"u{i}": rng.integers(0, 2048, (8, int(rng.integers(6, 14)))) for i in range(8)}
    text = {f"u{i}": rng.integers(0, 1000, (int(rng.integers(4, 9)),)) for i in range(4)}
    np.savez(tmp_path / "audio.npz", **audio)
    np.savez(tmp_path / "text.npz", **text)
    audio_json = tmp_path / "audio.json"
    text_json = tmp_path / "text.json"
    audio_json.write_text(
        json.dumps({"task": "audio_only", "keys": {"audio_seq": str(tmp_path / "audio.npz")}})
    )
    text_json.write_text(
        json.dumps({"task": "text_only", "keys": {"text_seq": str(tmp_path / "text.npz")}})
    )
    from rstnet_tpu.data.task_definition import load_data_for_all_tasks

    data_dict, text_dict = load_data_for_all_tasks([str(audio_json), str(text_json)])
    assert len(data_dict) == 8 and len(text_dict) == 4
    it = build_data_iterator(
        data_dict, text_dict, TOKENIZERS, batch_scale=40, max_length=64, parallel_number=9
    )
    batches = list(it)
    assert batches
    for b in batches:
        assert b["tokens"].shape[1] == 9
        assert b["tokens"].shape == b["masks"].shape
        assert (b["masks"] >= 0).all()


def test_find_data_jsons(tmp_path):
    for i in range(4):
        (tmp_path / f"d{i}.json").write_text("{}")
    files = find_data_jsons(str(tmp_path / "*.json"), rank=1, world_size=2)
    assert len(files) == 2
    assert all("d1" in f or "d3" in f for f in files)


def test_text_word_alignment_padding():
    """pad_tokens places subwords at word-start frames with <epad> markers."""
    from rstnet_tpu.data.tokenizers.text_tokenizer import TextTokenizer

    tok = TextTokenizer.__new__(TextTokenizer)  # skip file loading
    tok.pad_id = 128004
    tok.epad_id = 128005
    words = [
        {"word": "hello", "start": 0.0, "end": 0.3, "tokens": [11, 12]},
        {"word": "world", "start": 0.5, "end": 0.9, "tokens": [13]},
    ]
    out = tok.pad_tokens(words, duration=1.0, frame_rate=12.5)
    assert out.shape == (13,)
    assert out[0] == tok.epad_id  # start==0 shifts to 1, epad at 0
    assert out[1] == 11 and out[2] == 12
    start2 = round(0.5 * 12.5)
    assert out[start2 - 1] == tok.epad_id
    assert out[start2] == 13
    assert (out[start2 + 1 :] == tok.pad_id).all()
