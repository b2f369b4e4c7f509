"""ops/urls: URL canonicalization, URL dedup, domain stats."""
import pyarrow as pa
import ray.data as rd

from corenlp_ray.ops.urls import (
    domain_batch, domain_stats, domains_of, normalize_urls, url_dedup,
    url_normalize_batch,
)


def test_normalize_spec_cases():
    cases = {
        # fragment stripped
        "https://a.com/p#sec": "https://a.com/p",
        # tracking-only query collapses entirely
        "https://a.com/p?utm_source=x": "https://a.com/p",
        "https://a.com/p?utm_source=x&utm_medium=y": "https://a.com/p",
        # leading tracking param: survivor promoted to '?'
        "https://a.com/p?utm_source=x&id=3": "https://a.com/p?id=3",
        # mid/trailing tracking param removed, no dangling separator
        "https://a.com/p?id=3&fbclid=zz": "https://a.com/p?id=3",
        "https://a.com/p?id=3&gclid=g&k=v": "https://a.com/p?id=3&k=v",
        # everything at once
        "https://a.com/p?utm_a=1&id=3&msclkid=m#frag":
            "https://a.com/p?id=3",
        # untouched
        "https://a.com/p?id=3": "https://a.com/p?id=3",
        "https://a.com/p": "https://a.com/p",
        # utm-lookalike in the PATH is untouched
        "https://a.com/utm_source=x/p": "https://a.com/utm_source=x/p",
    }
    got = normalize_urls(pa.array(list(cases))).to_pylist()
    assert got == list(cases.values())


def test_domains_of():
    urls = pa.array([
        "https://news.example.com/a",
        "http://www.example.org/b?x=1",
        "https://user:pw@shop.example.io:8443/c",
        "ftp://files.example.net/d",
        "not a url",
        "",
    ])
    assert domains_of(urls).to_pylist() == [
        "news.example.com", "example.org", "shop.example.io",
        "files.example.net", "", ""]


def test_batch_wrappers_and_ray_ops(ray_session):
    t = pa.table({
        "doc_id": list(range(8)),
        "url": ["https://a.com/p", "https://a.com/p?utm_source=x",
                "https://a.com/p#f", "https://a.com/q",
                "https://www.b.org/r", "https://b.org/r?fbclid=1",
                "https://b.org/r", "https://c.net/s?id=1"],
        "n_chars": [10, 20, 30, 40, 50, 60, 70, 80],
    })
    assert url_normalize_batch(t)["url_norm"].to_pylist()[:3] == \
        ["https://a.com/p"] * 3
    assert domain_batch(t)["domain"].to_pylist()[4] == "b.org"

    ds = rd.from_arrow(t).repartition(3)
    dd = url_dedup(ds).to_pandas().set_index("url_norm")
    assert dd.loc["https://a.com/p", "canonical_doc_id"] == 0
    assert dd.loc["https://a.com/p", "dup_count"] == 3
    assert dd.loc["https://b.org/r", "dup_count"] == 2  # www. kept: the
    # normalizer does not touch hosts; domain-level grouping does
    assert len(dd) == 5

    st = domain_stats(ds).to_pandas().set_index("domain")
    assert st.loc["a.com", "n_pages"] == 4
    assert st.loc["a.com", "total_chars"] == 100
    assert st.loc["b.org", "n_pages"] == 3   # www stripped → same domain
