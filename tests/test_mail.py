"""Mail parsing parity vectors (handle_email.py semantics)."""

from __future__ import annotations

from tripwire_spark.functions.mail import (
    decode_subject_py,
    extract_to_py,
    extract_urls_py,
    payload_weight_py,
)


def test_url_pattern_src_lookbehind():
    # URLs following src=" are embedded images' SOURCES — skipped
    # (handle_email.py:148: negative lookbehind)
    body = 'click https://a.test/confirm/12345 ok <img src="https://b.test/track/98765"> end'
    urls = [u["url"] for u in extract_urls_py(body)]
    assert "https://a.test/confirm/12345" in urls
    assert all("b.test" not in u for u in urls)


def test_url_pattern_image_suffix():
    body = "see https://a.test/banner/image.png and https://a.test/confirm/1234 ."
    urls = [u["url"] for u in extract_urls_py(body)]
    assert urls == ["https://a.test/confirm/1234"]


def test_url_pattern_groups():
    u = extract_urls_py("go https://shop1.example.com/confirm/account/77xyz now")[0]
    assert u["domain"] == "shop1.example.com"
    assert u["path"] == "confirm/account/77xyz"


def test_extract_to_precedence():
    assert extract_to_py("To: John <j@a.test>\n\n") == "j@a.test"
    assert extract_to_py("To: plain@a.test\n\n") == "plain@a.test"
    assert (
        extract_to_py("To: undisclosed recipients:;\nX-Original-To: real@a.test\n\n")
        == "real@a.test"
    )
    assert extract_to_py("Delivered-To: d@a.test\n\n") == "d@a.test"
    assert extract_to_py("Subject: none\n\n") is None


def test_decode_subject_rfc2047():
    assert decode_subject_py("=?utf-8?q?Please_confirm?=") == "Please confirm"
    assert decode_subject_py("plain subject") == "plain subject"


def test_payload_prefers_plaintext():
    raw = (
        "Content-Type: multipart/alternative; boundary=B\n\n"
        "--B\nContent-Type: text/html\n\n<b>html body</b>\n"
        "--B\nContent-Type: text/plain\n\nplain body\n"
        "--B--\n"
    )
    w, p = payload_weight_py(raw)
    assert w == 1 and "plain body" in p
