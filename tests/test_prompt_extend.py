"""Prompt extension dispatch + backend plumbing."""

from worldforge_tpu.utils.prompt_extend import (LM_EN_SYS_PROMPT,
                                                LM_ZH_SYS_PROMPT,
                                                VL_EN_MULTI_SYS_PROMPT,
                                                VL_ZH_SYS_PROMPT,
                                                LocalPromptExpander,
                                                enhance_prompt_i2v,
                                                enhance_prompt_t2v)


def _echo(system, prompt, seed):
    return f"[{seed}] {prompt} (expanded)"


def test_dispatch_lm():
    e = LocalPromptExpander(_echo)
    assert e.decide_system_prompt("en") == LM_EN_SYS_PROMPT
    assert e.decide_system_prompt("zh") == LM_ZH_SYS_PROMPT


def test_dispatch_vl_and_multi():
    e = LocalPromptExpander(_echo, is_vl=True)
    assert e.decide_system_prompt("zh") == VL_ZH_SYS_PROMPT
    # multi-image flips the high bit even for a non-VL expander
    e2 = LocalPromptExpander(_echo)
    assert e2.decide_system_prompt(
        "en", multi_images_input=True) == VL_EN_MULTI_SYS_PROMPT
    assert e2.is_vl


def test_extend_success_and_seed():
    e = LocalPromptExpander(_echo)
    out = e("a cat", tar_lang="en", seed=7)
    assert out.status and out.seed == 7
    assert out.prompt == "[7] a cat (expanded)"


def test_extend_failure_falls_back():
    def boom(system, prompt, seed):
        raise RuntimeError("backend down")

    e = LocalPromptExpander(boom)
    out = e("a cat", tar_lang="en", seed=1)
    assert not out.status and out.prompt == "a cat"
    assert "backend down" in out.message
    assert enhance_prompt_t2v(e, "a cat", seed=1) == "a cat"


def test_vl_requires_backend():
    e = LocalPromptExpander(_echo, is_vl=True)
    out = e("a cat", image=object(), tar_lang="en", seed=2)
    assert not out.status
    assert enhance_prompt_i2v(e, "a cat", image=object(), seed=2) == "a cat"

    e2 = LocalPromptExpander(_echo, is_vl=True,
                             generate_vl_fn=lambda s, p, img, seed: p + "!")
    assert enhance_prompt_i2v(e2, "a cat", image=object(), seed=2) == "a cat!"
