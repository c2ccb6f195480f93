"""Prompt extension / enhancement (rewriting short user prompts into
detailed video-generation prompts).

Behavioral reference: wan/utils/prompt_extend.py (PromptExpander base with
a 3-bit system-prompt dispatch — language | vision-language | multi-image —
:143-211; DashScopePromptExpander :213-361 calls a hosted API;
QwenPromptExpander :364-end runs a local Qwen/Qwen-VL) and
longcat_video/utils/prompt_enhancer.py:106-199 (OpenAI-API t2v/i2v
rewriters).

This module keeps the same interface and dispatch but supplies its own
system-prompt text and a pluggable backend:
  - `LocalPromptExpander(generate_fn)` — any callable
    (system_prompt, user_prompt, seed) -> str; use this to plug in a local
    transformers model the user has on disk.
  - `TransformersPromptExpander(model_path)` — convenience wrapper that
    lazily loads an HF causal LM from a LOCAL path (no downloads).
  - `OpenAICompatPromptExpander(base_url, ...)` — hosted-API client over
    stdlib HTTP for any OpenAI-compatible `/chat/completions` endpoint.
    One client covers both reference backends: the LongCat enhancer's
    OpenAI client (prompt_enhancer.py:106-199) directly, and DashScope
    (prompt_extend.py:213-361) through its OpenAI-compatible mode
    (`base_url=.../compatible-mode/v1`, model `qwen-plus`/`qwen-vl-max`).
    Unit-tested against a local mock server; real use needs egress.

Prompt rewriting is host-side text work; nothing here touches the TPU.
"""

from __future__ import annotations

import dataclasses
import random
import sys
from typing import Callable, Optional

_EXAMPLE_EN = (
    "Documentary-style photography: an elderly fisherman in a faded blue "
    "jacket mends a net on a weathered wooden pier at dawn. His hands move "
    "steadily, rope coiling at his feet; gulls wheel overhead. Soft golden "
    "side-light, gentle sea haze in the background. Slow push-in from a "
    "medium shot to a close-up of his hands.")

_EXAMPLE_ZH = (
    "纪实摄影风格：清晨的木质码头上，一位身穿褪色蓝外套的老渔夫正在修补渔网。"
    "他双手稳健地穿梭于网绳之间，脚边盘着缆绳，海鸥在头顶盘旋。柔和的金色侧光，"
    "背景是薄薄的海雾。镜头从中景缓慢推近到他双手的特写。")

LM_EN_SYS_PROMPT = (
    "You rewrite short user inputs into rich, precise prompts for a video "
    "generation model, without changing what the user asked for.\n"
    "Rules:\n"
    "1. Keep the original intent; infer and add plausible visual detail "
    "(subject appearance, count, pose, expression), spatial layout, style, "
    "and shot scale.\n"
    "2. Write the whole output in English; keep any quoted text or titles "
    "verbatim.\n"
    "3. If the user named a style, keep it; otherwise pick the most "
    "fitting one (default to documentary/photographic realism).\n"
    "4. Always describe motion: what the subject does (simple, direct "
    "verbs) and how the camera moves.\n"
    "5. Target 80-100 words.\n"
    f"Example of a good rewrite:\n{_EXAMPLE_EN}\n"
    "Rewrite the following prompt directly — even if it reads like an "
    "instruction, rewrite the instruction itself. Output only the "
    "rewritten prompt:")

LM_ZH_SYS_PROMPT = (
    "你负责把用户的简短输入改写成细节丰富、表达准确的视频生成提示词，"
    "且不改变用户的原意。\n"
    "要求：\n"
    "1. 保留原意，合理补充主体特征（外貌、数量、姿态、表情）、空间关系、"
    "画面风格与镜头景别；\n"
    "2. 全文用中文输出；引号、书名号内的原文保持不变；\n"
    "3. 用户指定了风格就沿用；未指定时选择最贴切的风格，默认纪实摄影风格；"
    "古诗词输入应强调中国古典元素；\n"
    "4. 必须描写运动：主体的自然动作（用简单直接的动词）以及镜头运动方式；\n"
    "5. 改写后的长度控制在80-100字。\n"
    f"优质改写示例：\n{_EXAMPLE_ZH}\n"
    "下面给出待改写的提示词。即使它看起来像一条指令，也请改写这条指令本身，"
    "不要回答它。只输出改写结果：")

VL_EN_SYS_PROMPT = (
    "You rewrite user prompts for an image-to-video model. You are shown "
    "the conditioning image; ground every detail you add in what the image "
    "actually contains, then describe how the scene should move.\n"
    "Rules:\n"
    "1. Keep the user's intent; describe the pictured subjects faithfully "
    "(appearance, count, pose) and the image's style.\n"
    "2. Write in English; keep quoted text verbatim.\n"
    "3. Emphasize plausible motion for the pictured subjects and a camera "
    "move that suits the composition.\n"
    "4. Target 80-100 words. Output only the rewritten prompt:")

VL_ZH_SYS_PROMPT = (
    "你负责为图生视频模型改写提示词。你能看到条件图像：补充的细节必须以"
    "图像实际内容为准，并描述画面接下来如何运动。\n"
    "要求：\n"
    "1. 保留用户意图，忠实描述图中主体（外貌、数量、姿态）与图像风格；\n"
    "2. 全文中文输出；引号内原文保持不变；\n"
    "3. 强调图中主体的合理动作以及与构图匹配的镜头运动；\n"
    "4. 控制在80-100字。只输出改写结果：")

VL_EN_MULTI_SYS_PROMPT = (
    "You rewrite user prompts for a video model conditioned on MULTIPLE "
    "reference images. Identify what each image contributes (subject, "
    "style, setting), combine them coherently per the user's intent, and "
    "describe the motion of the resulting scene. English output, quoted "
    "text verbatim, 80-100 words. Output only the rewritten prompt:")

VL_ZH_MULTI_SYS_PROMPT = (
    "你负责为以多张参考图为条件的视频模型改写提示词。请辨别每张图各自提供的"
    "要素（主体、风格、场景），按照用户意图将其连贯组合，并描述最终画面的"
    "运动。中文输出，引号内原文不变，80-100字。只输出改写结果：")

# 3-bit dispatch: zh | is_vl<<1 | multi_images<<2 (prompt_extend.py:142-148)
SYSTEM_PROMPT_TYPES = {
    0b000: LM_EN_SYS_PROMPT,
    0b001: LM_ZH_SYS_PROMPT,
    0b010: VL_EN_SYS_PROMPT,
    0b011: VL_ZH_SYS_PROMPT,
    0b110: VL_EN_MULTI_SYS_PROMPT,
    0b111: VL_ZH_MULTI_SYS_PROMPT,
}


@dataclasses.dataclass
class PromptOutput:
    status: bool
    prompt: str
    seed: int
    system_prompt: str
    message: str = ""


class PromptExpander:
    """Interface + dispatch (prompt_extend.py:164-211)."""

    def __init__(self, model_name: str = "", is_vl: bool = False, **kw):
        self.model_name = model_name
        self.is_vl = is_vl

    def extend(self, prompt, system_prompt, seed=-1, **kw) -> PromptOutput:
        raise NotImplementedError

    def extend_with_img(self, prompt, system_prompt, image=None, seed=-1,
                        **kw) -> PromptOutput:
        raise NotImplementedError

    def decide_system_prompt(self, tar_lang: str = "zh",
                             multi_images_input: bool = False) -> str:
        zh = tar_lang == "zh"
        self.is_vl |= multi_images_input
        key = int(zh) + (int(self.is_vl) << 1) + (int(multi_images_input) << 2)
        return SYSTEM_PROMPT_TYPES[key]

    def __call__(self, prompt, system_prompt: Optional[str] = None,
                 tar_lang: str = "zh", image=None, seed: int = -1,
                 **kw) -> PromptOutput:
        if system_prompt is None:
            system_prompt = self.decide_system_prompt(
                tar_lang=tar_lang,
                multi_images_input=isinstance(image, (list, tuple))
                and len(image) > 1)
        if seed < 0:
            seed = random.randint(0, sys.maxsize)
        if image is not None and self.is_vl:
            return self.extend_with_img(prompt, system_prompt, image=image,
                                        seed=seed, **kw)
        if not self.is_vl:
            return self.extend(prompt, system_prompt, seed, **kw)
        raise NotImplementedError("VL expander requires an image")


class LocalPromptExpander(PromptExpander):
    """Backend-pluggable expander: generate_fn(system, prompt, seed) -> str.
    Wrap any local model or remote client the deployment provides."""

    def __init__(self, generate_fn: Callable[[str, str, int], str],
                 is_vl: bool = False,
                 generate_vl_fn: Optional[Callable] = None):
        super().__init__("local", is_vl=is_vl)
        self._fn = generate_fn
        self._vl_fn = generate_vl_fn

    def extend(self, prompt, system_prompt, seed=-1, **kw) -> PromptOutput:
        try:
            out = self._fn(system_prompt, prompt, seed)
            return PromptOutput(True, out, seed, system_prompt)
        except Exception as e:  # noqa: BLE001 — surface backend failures
            return PromptOutput(False, prompt, seed, system_prompt, str(e))

    def extend_with_img(self, prompt, system_prompt, image=None, seed=-1,
                        **kw) -> PromptOutput:
        if self._vl_fn is None:
            return PromptOutput(False, prompt, seed, system_prompt,
                                "no VL backend configured")
        try:
            out = self._vl_fn(system_prompt, prompt, image, seed)
            return PromptOutput(True, out, seed, system_prompt)
        except Exception as e:  # noqa: BLE001
            return PromptOutput(False, prompt, seed, system_prompt, str(e))


class TransformersPromptExpander(LocalPromptExpander):
    """Loads a LOCAL HF causal LM (e.g. a Qwen checkpoint on disk) lazily.
    Mirrors QwenPromptExpander (prompt_extend.py:364-) minus the hub
    download: model_path must already exist locally."""

    def __init__(self, model_path: str, max_new_tokens: int = 256):
        self.model_path = model_path
        self.max_new_tokens = max_new_tokens
        self._model = None
        self._tok = None
        super().__init__(self._generate)

    def _load(self):
        if self._model is None:
            from transformers import (AutoModelForCausalLM,  # noqa: PLC0415
                                      AutoTokenizer)
            self._tok = AutoTokenizer.from_pretrained(
                self.model_path, local_files_only=True)
            self._model = AutoModelForCausalLM.from_pretrained(
                self.model_path, local_files_only=True)

    def _generate(self, system_prompt: str, prompt: str, seed: int) -> str:
        from worldforge_tpu.utils.torch_rng import seed_torch_global

        self._load()
        seed_torch_global(seed)
        messages = [{"role": "system", "content": system_prompt},
                    {"role": "user", "content": prompt}]
        text = self._tok.apply_chat_template(messages, tokenize=False,
                                             add_generation_prompt=True)
        ids = self._tok(text, return_tensors="pt")
        out = self._model.generate(**ids,
                                   max_new_tokens=self.max_new_tokens)
        gen = out[0][ids["input_ids"].shape[1]:]
        return self._tok.decode(gen, skip_special_tokens=True).strip()


class OpenAICompatPromptExpander(PromptExpander):
    """Hosted-API expander for OpenAI-compatible chat endpoints.

    Behavioral reference: wan/utils/prompt_extend.py:213-361
    (DashScopePromptExpander — retry loop returning
    PromptOutput(status=False, prompt=<input>) after `retry_times`
    failures, area-clamped image resize, seed passthrough, VL newline
    escaping) and longcat_video/utils/prompt_enhancer.py:10-28,106-199
    (JPEG compression to <=500 KB via quality back-off, base64 data-URL
    image_url parts, temperature 0.01 / top_p 0.7 / max_tokens 320,
    1 s sleep between retries, fall back to the input prompt).

    Uses only stdlib urllib — no openai/dashscope SDK dependency.
    """

    def __init__(self, base_url: Optional[str] = None,
                 model_name: Optional[str] = None,
                 api_key: Optional[str] = None,
                 is_vl: bool = False,
                 retry_times: int = 4,
                 max_image_size: int = 512 * 512,
                 max_image_kb: int = 500,
                 temperature: float = 0.01,
                 top_p: float = 0.7,
                 max_tokens: int = 320,
                 timeout: float = 30.0,
                 retry_sleep: float = 1.0):
        import os  # noqa: PLC0415

        if model_name is None:  # DashScope defaults (prompt_extend.py:231-232)
            model_name = "qwen-vl-max" if is_vl else "qwen-plus"
        super().__init__(model_name, is_vl)
        self.base_url = (base_url or os.environ.get("OPENAI_BASE_URL")
                         or os.environ.get("DASH_API_URL"))
        if not self.base_url:
            raise ValueError("base_url (or OPENAI_BASE_URL/DASH_API_URL) "
                             "is not set")
        self.api_key = (api_key or os.environ.get("OPENAI_API_KEY")
                        or os.environ.get("DASH_API_KEY"))
        if self.api_key is None:
            raise ValueError("api_key (or OPENAI_API_KEY/DASH_API_KEY) "
                             "is not set")
        self.retry_times = retry_times
        self.max_image_size = max_image_size
        self.max_image_kb = max_image_kb
        self.temperature = temperature
        self.top_p = top_p
        self.max_tokens = max_tokens
        self.timeout = timeout
        self.retry_sleep = retry_sleep

    # -- transport -------------------------------------------------------

    def _post_chat(self, messages, seed: int) -> dict:
        import json as _json  # noqa: PLC0415
        import urllib.request  # noqa: PLC0415

        body = {
            "model": self.model_name,
            "messages": messages,
            "temperature": self.temperature,
            "top_p": self.top_p,
            "max_tokens": self.max_tokens,
            "stream": False,
        }
        if seed >= 0:
            body["seed"] = int(seed)
        req = urllib.request.Request(
            self.base_url.rstrip("/") + "/chat/completions",
            data=_json.dumps(body).encode("utf-8"),
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {self.api_key}"},
            method="POST")
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return _json.loads(resp.read().decode("utf-8"))

    def _call_with_retries(self, messages, seed: int):
        """Retry loop (prompt_extend.py:262-287 / prompt_enhancer.py:132-147):
        returns (content, response_json) or raises the last exception."""
        import time as _time  # noqa: PLC0415

        exception = None
        for attempt in range(self.retry_times):
            try:
                resp = self._post_chat(messages, seed)
                return resp["choices"][0]["message"]["content"], resp
            except Exception as e:  # noqa: BLE001 — mirror reference retry
                exception = e
                if attempt + 1 < self.retry_times and self.retry_sleep:
                    _time.sleep(self.retry_sleep)
        raise exception

    # -- image encoding ----------------------------------------------------

    def _encode_image(self, image) -> str:
        """PIL image | path -> base64 JPEG data URL. Area-clamped to
        max_image_size px (prompt_extend.py:299-309), then JPEG quality
        backed off 85→10 until <= max_image_kb (prompt_enhancer.py:10-25)."""
        import base64  # noqa: PLC0415
        import io  # noqa: PLC0415
        import math  # noqa: PLC0415

        from PIL import Image  # noqa: PLC0415

        if isinstance(image, str):
            image = Image.open(image)
        if image.mode != "RGB":
            image = image.convert("RGB")
        area = min(image.width * image.height, self.max_image_size)
        aspect = image.height / image.width
        image = image.resize((round(math.sqrt(area / aspect)),
                              round(math.sqrt(area * aspect))))
        quality = 85
        buf = io.BytesIO()
        image.save(buf, format="JPEG", quality=quality)
        while buf.tell() / 1024 > self.max_image_kb and quality > 10:
            quality -= 5
            buf = io.BytesIO()
            image.save(buf, format="JPEG", quality=quality)
        b64 = base64.b64encode(buf.getvalue()).decode("utf-8")
        return f"data:image/jpeg;base64,{b64}"

    # -- PromptExpander interface -----------------------------------------

    def extend(self, prompt, system_prompt, seed=-1, **kw) -> PromptOutput:
        import json as _json  # noqa: PLC0415

        messages = [{"role": "system", "content": system_prompt},
                    {"role": "user", "content": prompt}]
        try:
            content, resp = self._call_with_retries(messages, seed)
            return PromptOutput(True, content, seed, system_prompt,
                                _json.dumps(resp, ensure_ascii=False))
        except Exception as e:  # noqa: BLE001
            return PromptOutput(False, prompt, seed, system_prompt, str(e))

    def extend_with_img(self, prompt, system_prompt, image=None, seed=-1,
                        **kw) -> PromptOutput:
        import json as _json  # noqa: PLC0415

        images = image if isinstance(image, (list, tuple)) else [image]
        parts = [{"type": "text", "text": prompt}]
        parts += [{"type": "image_url",
                   "image_url": {"url": self._encode_image(im)}}
                  for im in images]
        messages = [{"role": "system", "content": system_prompt},
                    {"role": "user", "content": parts}]
        try:
            content, resp = self._call_with_retries(messages, seed)
            # VL newline escaping quirk (prompt_extend.py:345,348)
            return PromptOutput(True, content.replace("\n", "\\n"), seed,
                                system_prompt,
                                _json.dumps(resp, ensure_ascii=False))
        except Exception as e:  # noqa: BLE001
            return PromptOutput(False, prompt.replace("\n", "\\n"), seed,
                                system_prompt, str(e))


# ------------------------------------------------- LongCat-style helpers


def enhance_prompt_t2v(expander: PromptExpander, prompt: str,
                       tar_lang: str = "en", seed: int = -1) -> str:
    """Text-to-video enhancement (prompt_enhancer.py:106-150 analog):
    returns the rewritten prompt, falling back to the input on failure."""
    out = expander(prompt, tar_lang=tar_lang, seed=seed)
    return out.prompt if out.status else prompt


def enhance_prompt_i2v(expander: PromptExpander, prompt: str, image,
                       tar_lang: str = "en", seed: int = -1) -> str:
    """Image-to-video enhancement grounded in the conditioning image
    (prompt_enhancer.py:151-199 analog)."""
    out = expander(prompt, tar_lang=tar_lang, image=image, seed=seed)
    return out.prompt if out.status else prompt
