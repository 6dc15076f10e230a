"""Default production kernels for the external-model stages.

The pipelines (enrichment OCR/translate/logistics, translation sweep,
namer) take *injectable kernels* — plain callables executed inside
Arrow-batched pandas UDFs. This module ships the concrete production
implementations the reference uses, behind import gates so the package
imports cleanly in environments without the client libraries:

- Tesseract OCR over fetched images
  (reference utils/details_translator/db_orchestrator.py:87-102);
- OpenAI chat translation, temperature 0.3, error -> ""
  (db_orchestrator.py:104-120);
- OpenAI logistics extraction into the fixed 5-field dict, first-colon
  line parse, pad/truncate (db_orchestrator.py:49-56,122-141);
- Google Translate with 3 attempts / 2 s backoff and
  fallback-to-input (utils/universal_translator.py:28-43);
- gpt-4o namer returning (name, sku) parsed from "Name:"/"SKU:" lines,
  temperature 0.4, error -> ("", "")
  (utils/ai-helper/art-maker/namer.py:20-45).

Every factory accepts an injected ``client`` (tests pass mocks); only
when no client is given does it import the real library, raising a
clear RuntimeError when absent. Kernels are constructed per executor
by the pandas-UDF stages, so clients are never pickled through the
closure — factories return closures over lazily-built clients.
"""

from __future__ import annotations

import time
from collections.abc import Callable

#: db_orchestrator.py:49-56 — the exact extraction field set.
LOGISTIC_FIELDS = [
    "packaging_features",
    "dimensions_cm",
    "volumetric_weight_kg",
    "actual_weight_kg",
    "logistics_notes",
]

_TRANSLATOR_SYSTEM = (
    "You are a professional translator specialized in product "
    "descriptions for furniture and home decor."
)
_LOGISTICS_SYSTEM = (
    "You are a logistics expert for international furniture shipments. "
    "Based on the provided product description, extract only "
    "logistics-relevant information and fill out the following fields: "
    "Packaging features, Dimensions in cm (HxLxW), Volumetric weight "
    "(kg), Actual weight (kg), and Logistics notes."
)


def _require(module_name: str, hint: str):
    try:
        return __import__(module_name)
    except ImportError as e:
        raise RuntimeError(
            f"{module_name} is not installed; {hint} (or inject a "
            "client/kernel explicitly)"
        ) from e


def _chat_content(client, model: str, system: str, user: str, temperature: float) -> str:
    resp = client.chat.completions.create(
        model=model,
        messages=[
            {"role": "system", "content": system},
            {"role": "user", "content": user},
        ],
        temperature=temperature,
    )
    return resp.choices[0].message.content.strip()


def tesseract_ocr_kernel(
    lang: str = "chi_sim",
    fetch: Callable[[str], bytes] | None = None,
    pytesseract=None,
) -> Callable[[str], str]:
    """(image_url) -> joined non-empty OCR tokens; any failure -> "".

    Mirrors perform_ocr (db_orchestrator.py:87-102): image_to_data,
    keep stripped non-empty tokens, join with spaces.
    """

    def kernel(url: str) -> str:
        nonlocal pytesseract
        if not url:
            return ""
        try:
            if pytesseract is None:
                pytesseract = _require(
                    "pytesseract", "install pytesseract+Pillow for real OCR"
                )
            import io

            from PIL import Image  # noqa: PLC0415

            if fetch is not None:
                raw = fetch(url)
            else:
                import urllib.request

                with urllib.request.urlopen(url, timeout=10) as r:
                    raw = r.read()
            img = Image.open(io.BytesIO(raw))
            data = pytesseract.image_to_data(
                img, lang=lang, output_type=pytesseract.Output.DICT
            )
            return " ".join(t.strip() for t in data["text"] if t.strip())
        except Exception:
            return ""

    return kernel


def openai_translate_kernel(
    client=None, model: str = "gpt-3.5-turbo"
) -> Callable[[list[str]], list[str]]:
    """Batch translator (the pipelines' list[str] -> list[str]
    contract). Per text: empty -> "" without a call; API error -> ""
    (db_orchestrator.py:104-120)."""

    def kernel(texts: list[str]) -> list[str]:
        nonlocal client
        if client is None:
            client = _require("openai", "needed for OpenAI translation").OpenAI()
        out = []
        for text in texts:
            if not (text or "").strip():
                out.append("")
                continue
            try:
                out.append(
                    _chat_content(
                        client,
                        model,
                        _TRANSLATOR_SYSTEM,
                        "Translate the following Chinese text to English. "
                        "It comes from product descriptions of furniture "
                        f"and home decor: {text}",
                        temperature=0.3,
                    )
                )
            except Exception:
                out.append("")
        return out

    return kernel


def openai_logistics_kernel(
    client=None, model: str = "gpt-3.5-turbo"
) -> Callable[[str], dict]:
    """(description) -> the 5-field logistics dict. Response lines are
    split on the first ':'; missing lines pad with "", extras are
    dropped (db_orchestrator.py:122-141). Empty input / API error ->
    all-empty dict, no call on empty input."""

    def kernel(text: str) -> dict:
        nonlocal client
        if not (text or "").strip():
            return {f: "" for f in LOGISTIC_FIELDS}
        try:
            if client is None:
                client = _require(
                    "openai", "needed for logistics extraction"
                ).OpenAI()
            lines = _chat_content(
                client, model, _LOGISTICS_SYSTEM, text, temperature=0.3
            ).split("\n")
            values = [
                ln.split(":", 1)[-1].strip() if ":" in ln else "" for ln in lines
            ]
            padded = (values + [""] * len(LOGISTIC_FIELDS))[: len(LOGISTIC_FIELDS)]
            return dict(zip(LOGISTIC_FIELDS, padded))
        except Exception:
            return {f: "" for f in LOGISTIC_FIELDS}

    return kernel


def google_translate_kernel(
    source_lang: str,
    target_lang: str,
    client=None,
    retries: int = 3,
    backoff_s: float = 2.0,
    sleep: Callable[[float], None] = time.sleep,
) -> Callable[[list[str]], list[str]]:
    """Batch Google-Translate kernel. Per text: empty -> ""; up to
    ``retries`` attempts with ``backoff_s`` sleep after each failure;
    all attempts failed -> the input text unchanged
    (universal_translator.py:28-43)."""

    def kernel(texts: list[str]) -> list[str]:
        nonlocal client
        if client is None:
            try:
                from google.cloud import translate_v2  # noqa: PLC0415
            except ImportError as e:
                raise RuntimeError(
                    "google-cloud-translate is not installed; needed for "
                    "Google Translate (or inject a client explicitly)"
                ) from e
            client = translate_v2.Client()
        out = []
        for text in texts:
            if not (text or "").strip():
                out.append("")
                continue
            result = text  # fallback-to-input after exhausted retries
            for _ in range(retries):
                try:
                    result = client.translate(
                        text,
                        source_language=source_lang,
                        target_language=target_lang,
                    )["translatedText"]
                    break
                except Exception:
                    sleep(backoff_s)
            out.append(result)
        return out

    return kernel


def gpt4o_namer_kernel(
    client=None, model: str = "gpt-4o"
) -> Callable[[str, str, str], tuple[str, str]]:
    """(category, collection, attributes) -> (name, sku) parsed from
    "Name:"/"SKU:" response lines; any error -> ("", "")
    (namer.py:20-45)."""

    def kernel(category: str, collection: str, attributes: str) -> tuple[str, str]:
        nonlocal client
        prompt = (
            "You are an expert merchandiser for a furniture retailer. "
            f'Given the product category: "{category}", collection: '
            f'"{collection}", and attributes: "{attributes}", '
            "1. Suggest a short, natural English product name (max 7 "
            "words), starting with the product definition, for example: "
            "Curtains, brown, length: **, height: **, style: **.\n"
            "2. Invent a SKU/article code (6-12 alphanumeric chars, "
            "hinting at category or collection).\n"
            "Return as:\nName: ...\nSKU: ..."
        )
        try:
            if client is None:
                client = _require("openai", "needed for the namer").OpenAI()
            result = _chat_content(
                client, model, "You are a helpful assistant.", prompt, 0.4
            )
            name_line = next(
                (ln for ln in result.splitlines() if ln.startswith("Name:")), ""
            )
            sku_line = next(
                (ln for ln in result.splitlines() if ln.startswith("SKU:")), ""
            )
            return (
                name_line.replace("Name:", "").strip(),
                sku_line.replace("SKU:", "").strip(),
            )
        except Exception:
            return "", ""

    return kernel
