"""Golden parity against the reference's OWN tensor programs.

The prompt-to-prompt core (token alignment mappers, alpha-time-word replace
schedules, word->token index maps) must match the reference value-for-value —
these arrays *are* the editing semantics. This test imports the reference's
torch implementations (video_diffusion/prompt_attention/{seq_aligner,
ptp_utils}.py) and compares our numpy ports exactly, over every prompt pair
appearing in all shipped workload configs, under both the REAL CLIP BPE
tokenizer (rebuilt from the reference's OpenAI bpe gz — byte-identical
vocabulary) and the word-level stub.
"""
import glob
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from fatezero_tpu.common.config import load_config
from fatezero_tpu.models.tokenizer import CLIPTokenizer, StubTokenizer
from fatezero_tpu.ptp import schedules as our_sched
from fatezero_tpu.ptp import seq_aligner as our_sa

REF = "/root/reference/video_diffusion/prompt_attention"
BPE = "/root/reference/CLIP/clip/bpe_simple_vocab_16e6.txt.gz"
CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "config")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


def _load_ref(name):
    """Import a reference module standalone (omegaconf isn't installed; stub
    the one symbol ptp_utils touches)."""
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        om.dictconfig = types.ModuleType("omegaconf.dictconfig")

        class DictConfig(dict):
            pass

        om.dictconfig.DictConfig = DictConfig
        sys.modules["omegaconf"] = om
        sys.modules["omegaconf.dictconfig"] = om.dictconfig
    spec = importlib.util.spec_from_file_location(f"ref_{name}", f"{REF}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _prompt_cases():
    """(source, target, cross_replace_steps, eq_words) per shipped config prompt."""
    cases = []
    for path in sorted(glob.glob(os.path.join(CONFIG_DIR, "**", "*.yaml"), recursive=True)):
        if not os.path.relpath(path, CONFIG_DIR).count(os.sep):
            continue
        cfg = load_config(path).to_dict()
        ed = cfg.get("editing_config", {}) or {}
        src = ed.get("source_prompt", (cfg.get("dataset_config") or {}).get("prompt", ""))
        p2p = ed.get("p2p_config", {}) or {}
        for i, tgt in enumerate(ed.get("editing_prompts", [])):
            blk = dict(p2p.get(i, p2p.get(str(i), {})) or {})
            cross = blk.get("cross_replace_steps", 0.8)
            if isinstance(cross, dict):
                cross = tuple(sorted((k, float(v)) for k, v in cross.items()))
            else:
                cross = float(cross)
            eq = blk.get("eq_params") or {}
            cases.append((str(src), str(tgt), cross, tuple(eq.get("words", []))))
    # dedupe (many configs repeat the reconstruction pair)
    return sorted(set(cases), key=str)


CASES = _prompt_cases()


@pytest.fixture(scope="module", params=["clip_bpe", "stub"])
def tokenizer(request):
    if request.param == "clip_bpe":
        if not os.path.exists(BPE):
            pytest.skip("OpenAI bpe vocab not mounted")
        return CLIPTokenizer.from_openai_bpe(BPE)
    return StubTokenizer()


@pytest.fixture(scope="module")
def ref_sa():
    return _load_ref("seq_aligner")


@pytest.fixture(scope="module")
def ref_ptp():
    return _load_ref("ptp_utils")


def test_prompt_case_coverage():
    assert len(CASES) >= 40  # 27 configs x 2-4 prompts, deduped


def test_refinement_mappers_golden(tokenizer, ref_sa):
    for src, tgt, _, _ in CASES:
        m_ref, a_ref = ref_sa.get_refinement_mapper([src, tgt], tokenizer)
        m_our, a_our = our_sa.get_refinement_mapper([src, tgt], tokenizer)
        np.testing.assert_array_equal(m_ref.numpy(), np.asarray(m_our), err_msg=f"{src!r}->{tgt!r}")
        np.testing.assert_array_equal(a_ref.numpy(), np.asarray(a_our, np.float32))


def test_replacement_mappers_golden(tokenizer, ref_sa):
    n = 0
    for src, tgt, _, _ in CASES:
        if len(src.split(" ")) != len(tgt.split(" ")):
            continue  # replace mode gated on equal word counts
        m_ref = ref_sa.get_replacement_mapper([src, tgt], tokenizer)
        m_our = our_sa.get_replacement_mapper([src, tgt], tokenizer)
        np.testing.assert_array_equal(
            m_ref.numpy(), np.asarray(m_our, np.float32), err_msg=f"{src!r}->{tgt!r}"
        )
        n += 1
    assert n >= 5


def test_word_inds_golden(tokenizer, ref_ptp):
    for src, tgt, _, eq_words in CASES:
        for text in (src, tgt):
            for word in set(text.split(" ")) | set(eq_words):
                if not word:
                    continue
                np.testing.assert_array_equal(
                    ref_ptp.get_word_inds(text, word, tokenizer),
                    our_sa.get_word_inds(text, word, tokenizer),
                    err_msg=f"{word!r} in {text!r}",
                )


def test_alpha_time_words_golden(tokenizer, ref_ptp):
    for steps in (10, 50):
        for src, tgt, cross, _ in CASES:
            ref = ref_ptp.get_time_words_attention_alpha(
                [src, tgt], steps, dict(cross) if isinstance(cross, tuple) else cross,
                tokenizer,
            )
            ours = our_sched.get_time_words_attention_alpha(
                [src, tgt], steps, dict(cross) if isinstance(cross, tuple) else cross,
                tokenizer,
            )
            np.testing.assert_array_equal(
                ref.numpy(), np.asarray(ours, np.float32),
                err_msg=f"{src!r}->{tgt!r} cross={cross}",
            )
