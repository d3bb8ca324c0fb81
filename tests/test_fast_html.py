"""Fast-HTML-tokenizer equivalence (spec._fast_feed).

The contract: extract_html's public output is ALWAYS identical to the
pure html.parser path — the fast scanner either delivers the identical
event stream or bails and the caller reparses. Pinned three ways:
forced both-paths comparison over every HTML fixture document,
adversarial constructs (the bail boundary), and hypothesis tag soup.
"""

import pyarrow.dataset as pads
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_model_ray.spec import (
    _BlockParser, _fast_feed, decode_text, extract_html, sniff_mime)


def _slow_state(text):
    p = _BlockParser()
    p.feed(text)
    p.close()
    return p.blocks, p.tables


def _fast_state(text):
    p = _BlockParser()
    ok = _fast_feed(p, text)
    if not ok:
        return None
    p._end_cell()
    p._flush()
    return p.blocks, p.tables


def _assert_public_equal(payload: bytes):
    fast = extract_html(payload)          # fast path w/ fallback
    slow_p = _BlockParser()
    slow_p.feed(decode_text(payload))
    slow_p.close()
    text = decode_text(payload)
    assert _fast_state(text) is None or _fast_state(text) == _slow_state(text)
    # and the public output equals a pure-slow extraction
    import ocr_model_ray.spec as spec
    orig = spec._fast_feed
    spec._fast_feed = lambda parser, t: False  # force slow path
    try:
        slow = extract_html(payload)
    finally:
        spec._fast_feed = orig
    assert fast.pages[0].regions == slow.pages[0].regions or \
        [r.text for r in fast.pages[0].regions] == \
        [r.text for r in slow.pages[0].regions]
    assert len(fast.tables) == len(slow.tables)
    for ft, st_ in zip(fast.tables, slow.tables):
        assert ft.cells == st_.cells


@pytest.mark.usefixtures("ray_session")
def test_fast_path_equals_slow_on_all_html_fixtures(t1_pages_dir,
                                                    t2_pages_dir):
    n_html = 0
    n_fast = 0
    for d in (t1_pages_dir, t2_pages_dir):
        tab = pads.dataset(d).to_table(columns=["html"])
        for payload in tab["html"].to_pylist():
            if sniff_mime(payload[:512]) != "text/html":
                continue
            n_html += 1
            text = decode_text(payload)
            fast = _fast_state(text)
            if fast is not None:
                n_fast += 1
                assert fast == _slow_state(text)
    assert n_html > 100
    # the fast path must actually fire on the corpus, else no perf win
    assert n_fast / n_html > 0.9, f"fast path used on {n_fast}/{n_html}"


CASES = [
    b"<html><body><p>plain &amp; simple &#65;&lt;tag&gt;</p></body></html>",
    b"<!DOCTYPE html><html><p>doctype ok</p></html>",
    b"<p>comment <!-- <p>hidden</p> --> after</p>",
    b"<p>br<br/>self-closing</p>",
    b"<script>if (a<b && c>d) { x='</'; }</script><p>after script</p>",
    b"<style>p > a { color: red }</style><p>after style</p>",
    b"<script>never closed...",
    b"<table><tr><td colspan='3'>wide</td><td>b</td></tr></table>",
    b'<table><tr><td colspan="2">q</td></tr></table>',
    b"<td colspan=4>bare numeric</td>",
    b'<p title="a>b">quoted gt attr</p>',          # bail path
    b"<p>bogus < 5 lt</p>",                        # bail path
    b"<![CDATA[ marked ]]><p>x</p>",               # bail path
    b"<?php echo 1 ?><p>pi ok</p>",
    b"<P>UPPER case tags</P><DiV>mixed</dIv>",
    b"<ul><li>one</li><li>two & three</li></ul>",
    b"<a href='x'>link text here</a> plain trailing",
    b"<p>unclosed paragraph",
    b"<h2>heading &nbsp; entity</h2>",
    b"<script >spaced attr area</script><p>ok</p>",
    b"<table><tr><td>unclosed table cell text",
    b"<table><tr><td colspan=2>open cell</td><tr><td>second row",
    b"<div>text <a href='q'>anchor</a> tail</div><nav>dropped nav</nav>",
    # round-2 code-review regressions: '/' glued to an unquoted value is
    # NOT self-closing; quotes inside unquoted values; '--  >' comments
    b"<script src=foo/>alert(1); var x = 2;</script><p>after the script "
    b"with enough words to clear the block threshold</p>",
    b"<a href=http://x.com/>link text with plenty of characters here</a>"
    b"<p>plain paragraph beside it with enough text to keep</p>",
    b"<table><tr><td colspan=2/>cell</td></tr></table>",
    b"<div x=don't y='a>b'>text stays visible with plenty of words to "
    b"pass thresholds</div>",
    b"<p>before</p><!--c--  >visible text here-->tail words and more "
    b"of them to pass the threshold limits</p>",
]


@pytest.mark.parametrize("payload", CASES)
def test_fast_equals_slow_adversarial(payload):
    _assert_public_equal(payload)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="<>/ab c!&;='\"-p", min_size=0, max_size=120))
def test_fast_equals_slow_tag_soup(soup):
    text = soup
    fast = _fast_state(text)
    if fast is not None:
        assert fast == _slow_state(text)


def test_fast_equals_slow_structured_fuzz():
    """Seeded structured-HTML fuzz (realistic tags/attrs incl. unquoted
    values, separator slashes, spaced comments, raw-text elements):
    every fast-accepted document must match html.parser exactly."""
    import random
    random.seed(7)
    TAGS = ["p", "div", "h1", "li", "ul", "a", "td", "tr", "table",
            "br", "span", "nav", "script", "style"]
    WORDS = ["alpha", "beta", "x>y", "a&b", "don't", "q=r", "5<6", "tail"]

    def rand_attrs():
        out = []
        for _ in range(random.randint(0, 3)):
            name = random.choice(["href", "colspan", "id", "src"])
            style = random.randint(0, 4)
            if style == 0:
                out.append(name)
            elif style == 1:
                out.append(f'{name}="{random.choice(WORDS)}"')
            elif style == 2:
                out.append(name + "='" + random.choice(["v", "2", "a b"]) + "'")
            elif style == 3:
                out.append(f"{name}={random.choice(['v1', '2', 'foo/', 'b//'])}")
            else:
                out.append(f'{name} = "{random.choice(["z", "3"])}"')
        return (" " + " ".join(out)) if out else ""

    def rand_html(depth=0):
        parts = []
        for _ in range(random.randint(1, 5)):
            r = random.random()
            if r < 0.35 or depth > 3:
                parts.append(random.choice(WORDS) + " ")
            elif r < 0.45:
                parts.append(f"<{random.choice(TAGS)}{rand_attrs()}/>")
            elif r < 0.55:
                parts.append("<!-- c " + random.choice(["-->", "--  >"]))
            else:
                t = random.choice(TAGS)
                parts.append(f"<{t}{rand_attrs()}>" + rand_html(depth + 1)
                             + (f"</{t}>" if random.random() < 0.9 else ""))
        return "".join(parts)

    n_fast = 0
    for _ in range(1500):
        text = rand_html()
        fast = _fast_state(text)
        if fast is None:
            continue
        n_fast += 1
        assert fast == _slow_state(text), repr(text[:200])
    assert n_fast > 200  # the fast path must actually fire
