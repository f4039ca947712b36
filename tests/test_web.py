"""text/web.py — URL canonicalization + host aggregation."""

import numpy as np
import pyarrow as pa


class TestCanonicalUrls:
    def test_edges(self):
        from maup_ray.text.web import canonical_urls_batch

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
                "url": pa.array(
                    [
                        "https://WWW.Example.COM/A/b?utm=1&x=2",
                        "http://example.com/A/b#frag",
                        "https://example.com",          # no path
                        "HTTPS://www.www.net/",          # www-only host
                        "ftp://Host.Org/file?q#f",
                        "https://example.com/?q=1",      # root + query
                    ]
                ),
            }
        )
        c = canonical_urls_batch(t)
        assert c["host"].to_pylist() == [
            "example.com", "example.com", "example.com",
            "www.net", "host.org", "example.com",
        ]
        assert c["path"].to_pylist() == [
            "/A/b", "/A/b", "/", "/", "/file", "/",
        ]


class TestHostStats:
    def test_matches_brute_force(self, ray_session):
        import ray.data

        from maup_ray.text.web import host_stats

        rng = np.random.default_rng(9)
        n = 400
        hosts = rng.integers(0, 12, size=n)
        paths = rng.integers(0, 9, size=n)
        www = rng.integers(0, 2, size=n)
        urls = [
            f"https://{'www.' if w else ''}h{h}.example.com/p{p}"
            for h, p, w in zip(hosts, paths, www)
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array(
                    np.arange(n, dtype=np.int64)
                ),
                "url": pa.array(urls),
            }
        )
        got = {
            r["host"]: r
            for r in host_stats(
                ray.data.from_arrow(tbl).repartition(5)
            ).take_all()
        }
        for h in np.unique(hosts):
            m = hosts == h
            key = f"h{h}.example.com"
            assert got[key]["n_urls"] == int(m.sum())
            assert got[key]["n_paths"] == len(
                np.unique(paths[m])
            )
        # table path agrees
        t2 = host_stats(tbl)
        for r in t2.to_pylist():
            assert got[r["host"]]["n_urls"] == r["n_urls"]
            assert got[r["host"]]["n_paths"] == r["n_paths"]
