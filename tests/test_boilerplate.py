"""Boilerplate removal (functions/boilerplate.py)."""

from tripwire_spark.functions.boilerplate import extract_blocks_py, main_content

PROSE = "this paragraph carries enough plain running text to clear the length gate"


def test_blocks_visibility_and_link_chars():
    html = (
        "<html><head><title>T</title><script>var x=1;</script></head><body>"
        '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
        f"<p>{PROSE}</p>"
        "<div><div>inner nested</div>outer tail</div>"
        "</body></html>"
    )
    blocks = extract_blocks_py(html)
    texts = [b["text"] for b in blocks]
    assert texts == ["Home About", PROSE, "inner nested", "outer tail"]
    assert blocks[0]["link_chars"] == len("Home") + len("About")
    assert blocks[1]["link_chars"] == 0
    # script/title never leak into any block
    assert not any("var x" in t or t == "T" for t in texts)


def test_blocks_tolerate_hostile_html():
    assert extract_blocks_py(None) == []
    assert extract_blocks_py("") == []
    assert extract_blocks_py(b"\xff\xfe<p>ok") [-1]["text"] == "ok"
    # unclosed tags: trailing buffer still flushes
    assert extract_blocks_py("<div>dangling")[-1]["text"] == "dangling"


def test_main_content_classification(spark):
    rows = [
        # nav + prose + footer: only prose survives
        (1, '<body><div><a href="/h">Home</a> <a href="/b">Blog</a></div>'
            f"<p>{PROSE}</p>"
            '<div><a href="/t">Terms</a> <a href="/p">Privacy</a></div></body>'),
        # long but link-dense block (a link farm) is dropped
        (2, "<body><p>" + " ".join(f'<a href="/{i}">anchor text number {i}</a>' for i in range(8))
            + f"</p><p>{PROSE}</p></body>"),
        # all boilerplate -> empty main_text, zero kept
        (3, '<body><div><a href="/x">x</a></div><p>tiny</p></body>'),
    ]
    pages = spark.createDataFrame(rows, "page_id long, html string")
    out = {r.page_id: r for r in main_content(pages).collect()}
    assert out[1].main_text == PROSE and out[1].n_blocks_kept == 1
    assert out[1].n_blocks_total == 3
    assert out[2].main_text == PROSE  # farm block dropped despite length
    assert out[3].main_text == "" and out[3].n_blocks_kept == 0

    # classification rides the scan: no shuffle anywhere
    plan = main_content(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_main_content_multiblock_order(spark):
    p2 = "a second surviving paragraph with plenty of ordinary words inside it"
    pages = spark.createDataFrame(
        [(1, f"<body><p>{PROSE}</p><div><a href='/n'>nav nav nav</a></div><p>{p2}</p></body>")],
        "page_id long, html string",
    )
    row = main_content(pages).collect()[0]
    assert row.main_text == PROSE + "\n" + p2  # document order preserved
