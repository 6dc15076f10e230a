"""Default external kernels: the module must import without any client
library, and every kernel's retry/backoff/fallback/parse semantics are
asserted against mocked clients (the reference's behavior:
db_orchestrator.py OCR/translate/logistics, universal_translator.py
retry loop, namer.py Name:/SKU: parse)."""

from __future__ import annotations

import pytest

from product_etl_spark import kernels


class _Resp:
    def __init__(self, content):
        self.choices = [
            type("C", (), {"message": type("M", (), {"content": content})()})()
        ]


class _ChatClient:
    """Scriptable openai-shaped mock: pops one scripted result per
    call; an Exception instance raises instead."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = []
        outer = self

        class _Completions:
            def create(self, **kw):
                outer.calls.append(kw)
                r = outer.script.pop(0)
                if isinstance(r, Exception):
                    raise r
                return _Resp(r)

        self.chat = type("Chat", (), {"completions": _Completions()})()


def test_module_imports_without_client_libs():
    # openai / pytesseract / google-cloud are absent in this container;
    # importing and constructing factories must still work...
    k = kernels.google_translate_kernel("zh-CN", "en", sleep=lambda s: None)
    # ...and only *using* one without an injected client raises clearly.
    with pytest.raises(RuntimeError, match="google-cloud-translate"):
        k(["text"])
    with pytest.raises(RuntimeError, match="openai"):
        kernels.openai_translate_kernel()(["text"])


def test_google_translate_retry_backoff_and_fallback():
    class _Flaky:
        def __init__(self, fail_times):
            self.fail_times, self.calls = fail_times, 0

        def translate(self, text, source_language, target_language):
            self.calls += 1
            if self.calls <= self.fail_times:
                raise ConnectionError("boom")
            return {"translatedText": f"{text}->{target_language}"}

    sleeps = []
    # fails twice, succeeds on 3rd attempt: 2 backoff sleeps of 2 s
    c = _Flaky(2)
    k = kernels.google_translate_kernel(
        "zh-CN", "en", client=c, sleep=sleeps.append
    )
    assert k(["你好"]) == ["你好->en"]
    assert c.calls == 3 and sleeps == [2.0, 2.0]
    # all 3 attempts fail: fallback returns the INPUT unchanged
    c2 = _Flaky(99)
    sleeps.clear()
    k2 = kernels.google_translate_kernel(
        "zh-CN", "en", client=c2, sleep=sleeps.append
    )
    assert k2(["原文", ""]) == ["原文", ""]
    assert c2.calls == 3 and sleeps == [2.0, 2.0, 2.0]  # empty text: no call


def test_openai_translate_empty_skips_and_error_yields_empty():
    client = _ChatClient(["Hello sofa", RuntimeError("api down")])
    k = kernels.openai_translate_kernel(client=client)
    assert k(["你好沙发", "", "  ", "另一个"]) == ["Hello sofa", "", "", ""]
    assert len(client.calls) == 2  # blank inputs never reach the API
    assert client.calls[0]["temperature"] == 0.3
    assert "furniture and home decor" in client.calls[0]["messages"][0]["content"]


def test_logistics_parse_pads_and_truncates():
    client = _ChatClient(
        [
            # 3 parseable lines + 1 colon-free line -> pad to 5
            "Packaging: box\nDimensions: 10x20x30\nno colon here\nWeight: 4",
            RuntimeError("api down"),
        ]
    )
    k = kernels.openai_logistics_kernel(client=client)
    out = k("some product text")
    assert list(out) == kernels.LOGISTIC_FIELDS
    assert out["packaging_features"] == "box"
    assert out["dimensions_cm"] == "10x20x30"
    assert out["volumetric_weight_kg"] == ""  # the colon-free line
    assert out["actual_weight_kg"] == "4"
    assert out["logistics_notes"] == ""  # padded
    # API error and empty input both give the all-empty dict
    assert set(k("more text").values()) == {""}
    assert set(k("   ").values()) == {""}
    assert len(client.calls) == 2


def test_namer_parses_name_and_sku_lines():
    client = _ChatClient(
        ["Name: Curtains, brown, linen\nSKU: CURT-BR123", RuntimeError("x")]
    )
    k = kernels.gpt4o_namer_kernel(client=client)
    assert k("Curtains", "Loft", "color: brown") == (
        "Curtains, brown, linen",
        "CURT-BR123",
    )
    assert client.calls[0]["model"] == "gpt-4o"
    assert client.calls[0]["temperature"] == 0.4
    assert k("a", "b", "c") == ("", "")  # error -> empty pair


def test_ocr_kernel_joins_nonempty_tokens():
    class _FakeTess:
        class Output:
            DICT = "dict"

        @staticmethod
        def image_to_data(img, lang, output_type):
            assert lang == "chi_sim"
            return {"text": [" 沙发 ", "", "  ", "木质", "frame"]}

    # PIL is absent in this container; a 1x1 GIF via a fake fetch would
    # still need Image.open — so fake the PIL import path only if
    # Pillow exists; otherwise assert the graceful "" fallback.
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    gif = (  # minimal valid 1x1 GIF87a
        b"GIF87a\x01\x00\x01\x00\x80\x00\x00\x00\x00\x00\xff\xff\xff,"
        b"\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02D\x01\x00;"
    )
    k = kernels.tesseract_ocr_kernel(fetch=lambda url: gif, pytesseract=_FakeTess)
    out = k("http://x/img.gif")
    if have_pil:
        assert out == "沙发 木质 frame"
    else:
        assert out == ""  # import failure degrades to "", like the reference
    assert k("") == ""  # empty url never fetches
