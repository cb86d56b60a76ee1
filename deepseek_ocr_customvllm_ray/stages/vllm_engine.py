"""Import-guarded vLLM OCR engine: the real A1/A3/A4 deployment wiring.

The actor seam (``MockOcrEngine``/``FallbackOcrEngine`` in
``ocr_stage.py``) defines the observable contract — Arrow page batch in,
``raw_text`` markdown-with-grounding-tags column out.  This module supplies
the GPU implementation of that contract so a vLLM-equipped cluster swaps
engines by config, exactly like the ``PyMuPdfRenderer`` seam:

- engine kwargs mirror the reference init (``app/core/model_init.py:17-41``):
  ``block_size=256, enforce_eager=True, max_model_len=8192, swap_space=0,
  max_num_seqs=32, tensor_parallel_size=1, gpu_memory_utilization=0.9``;
- greedy sampling mirrors ``model_init.py:42-57``: ``temperature=0.0,
  max_tokens=8192, skip_special_tokens=False,
  include_stop_str_in_output=True`` with the no-repeat-n-gram logits
  processor (``ngram_size=20, window_size=50``, whitelist token ids
  ``{128821, 128822}`` = ``<td>``/``</td>``);
- the generate call is ``llm.generate(batch_inputs, sampling_params)`` over
  one Arrow batch (``app/services/processor.py:25-34``), with records built
  from the reference prompt (``app/config.py:58``).

Nothing here imports vLLM/PIL at module load: constructing
:class:`VllmOcrEngine` without vLLM raises ImportError immediately (fail
fast on the driver, not inside a worker task), and the factory
:func:`make_ocr_engine` falls back to the deterministic mock so pipelines
stay runnable in this sandbox.
"""

from __future__ import annotations

from typing import List, Optional, Set

import pyarrow as pa

from ..config import ExtractConfig

# Reference prompt, byte-exact (app/config.py:58).
PROMPT = "<image>\n<|grounding|>Convert the document to markdown."

# Reference whitelist (model_init.py:44-48): vocab ids of <td>, </td>.
WHITELIST_TOKEN_IDS = frozenset({128821, 128822})


class TokenNGramBanProcessor:
    """Decode-time no-repeat-n-gram ban at token-id level (A4).

    Re-expression of the reference's logits-processor semantics
    (``process/ngram_norepeat.py:7-40``): when the last ``ngram_size - 1``
    generated ids match an (n-1)-prefix that already occurred inside the
    trailing ``window_size`` ids, the id that completed that earlier n-gram
    is banned (score -> -inf), unless whitelisted.  The word-level twin in
    ``functions/ngram.py`` carries the differential tests for the shared
    semantics; this class is the vLLM wiring (callable signature
    ``(input_ids, scores) -> scores``).
    """

    def __init__(
        self,
        ngram_size: int = 20,
        window_size: int = 50,
        whitelist_token_ids: Optional[Set[int]] = None,
    ) -> None:
        if not isinstance(ngram_size, int) or ngram_size <= 0:
            raise ValueError(f"ngram_size must be a positive int, got {ngram_size}")
        if not isinstance(window_size, int) or window_size <= 0:
            raise ValueError(f"window_size must be a positive int, got {window_size}")
        self.ngram_size = ngram_size
        self.window_size = window_size
        self.whitelist = frozenset(whitelist_token_ids or ())

    def banned_tokens(self, input_ids: List[int]) -> Set[int]:
        """Pure decision core (torch-free, unit-testable): the set of token
        ids banned for the next position."""
        n = self.ngram_size
        if len(input_ids) < n:
            return set()
        prefix = tuple(input_ids[-(n - 1):]) if n > 1 else ()
        start = max(0, len(input_ids) - self.window_size)
        banned: Set[int] = set()
        for i in range(start, len(input_ids) - n + 1):
            if n == 1 or tuple(input_ids[i:i + n - 1]) == prefix:
                cand = input_ids[i + n - 1]
                if cand not in self.whitelist:
                    banned.add(cand)
        return banned

    def __call__(self, input_ids, scores):
        banned = self.banned_tokens(list(input_ids))
        if banned:
            for t in banned:  # few ids; item assignment works for torch/numpy
                scores[t] = float("-inf")
        return scores


def vllm_available() -> bool:
    try:
        import vllm  # noqa: F401

        return True
    except Exception:
        return False


class VllmOcrEngine:
    """GPU actor-pool OCR stage: loads DeepSeek-OCR weights under vLLM ONCE
    per actor in ``__init__``, scores one Arrow page batch per ``__call__``.

    Stage signature is identical to ``MockOcrEngine`` (page rows in, same
    rows + ``raw_text`` out; html rows pass through with ``raw_text=""``),
    so the swap is ``map_batches(VllmOcrEngine, fn_constructor_kwargs=...,
    num_gpus=1, batch_size=cfg.ocr_batch_size)`` — ``batch_size`` plays the
    reference's 40-page chunk role and ``max_num_seqs=32`` its continuous
    batching (config.py:17,60).

    Pages arrive as base64 PNG in the ``emission`` column (the
    ``PyMuPdfRenderer`` contract).  Expects a deployment with vllm + PIL;
    constructing without them raises ImportError immediately.
    """

    def __init__(
        self,
        cfg: ExtractConfig = None,
        model_path: str = "",
        max_num_seqs: int = 32,
        gpu_memory_utilization: float = 0.9,
        prompt: str = PROMPT,
    ) -> None:
        from vllm import LLM, SamplingParams  # ImportError = fail fast
        from PIL import Image  # noqa: F401 — page decode needs it

        if not model_path:
            raise ValueError("model_path is required (no default checkout here)")
        self.cfg = cfg or ExtractConfig()
        self.prompt = prompt
        # reference engine kwargs, model_init.py:22-35
        self.llm = LLM(
            model=model_path,
            block_size=256,
            enforce_eager=True,
            trust_remote_code=True,
            max_model_len=8192,
            swap_space=0,
            max_num_seqs=max_num_seqs,
            tensor_parallel_size=1,
            gpu_memory_utilization=gpu_memory_utilization,
            disable_mm_preprocessor_cache=True,
        )
        # reference sampling, model_init.py:42-57
        self.sampling_params = SamplingParams(
            temperature=0.0,
            max_tokens=8192,
            logits_processors=[
                TokenNGramBanProcessor(
                    ngram_size=self.cfg.ngram_size,
                    window_size=self.cfg.ngram_window,
                    whitelist_token_ids=set(WHITELIST_TOKEN_IDS),
                )
            ],
            skip_special_tokens=False,
            include_stop_str_in_output=True,
        )

    def _page_image(self, emission: str):
        """base64 PNG (PyMuPdfRenderer emission) -> deskewed+cropped PIL
        image (M1 -> M2 order, postprocess_md.py:168-180)."""
        import base64
        import io

        from PIL import Image

        from ..functions.tiling import prepare_page_image

        img = Image.open(io.BytesIO(base64.b64decode(emission))).convert("RGB")
        return prepare_page_image(img)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .ocr_stage import KIND_PDF_PAGE

        kinds = batch["kind"].to_pylist()
        emissions = batch["emission"].to_pylist()
        pdf_ix = [i for i, k in enumerate(kinds) if k == KIND_PDF_PAGE]
        raw = [""] * len(kinds)
        if pdf_ix:
            records = [
                {
                    "prompt": self.prompt,
                    "multi_modal_data": {"image": self._page_image(emissions[i])},
                }
                for i in pdf_ix
            ]
            outputs = self.llm.generate(records, self.sampling_params)
            for i, out in zip(pdf_ix, outputs):
                raw[i] = out.outputs[0].text
        return batch.append_column("raw_text", pa.array(raw, pa.large_string()))


def make_ocr_engine(prefer_real: bool = True):
    """Engine selection as CONFIG (the ``make_page_renderer`` pattern):
    returns the :class:`VllmOcrEngine` class when vLLM exists (and
    ``prefer_real``), else ``MockOcrEngine`` — pass the result to
    ``map_batches`` / ``build_extract_pipeline(engine_cls=...)``."""
    from .ocr_stage import MockOcrEngine

    if prefer_real and vllm_available():
        return VllmOcrEngine
    return MockOcrEngine
