"""Compilation-cache namespacing: cross-host poisoning must be impossible.

XLA:CPU AOT executables compiled on a host with different CPU features
SIGABRT/SIGILL when loaded (cpu_aot_loader machine-feature mismatch); the
persistent cache dir must therefore differ between feature-distinct hosts.
"""

import unittest.mock as mock

from tricolo_tpu.utils import compcache


class TestCompilationCacheDir:
    def test_stable_on_same_host(self):
        assert compcache.compilation_cache_dir() == compcache.compilation_cache_dir()

    def test_differs_across_cpu_features(self):
        with mock.patch.object(
            compcache, "_host_cpu_features", lambda: "flags: sse2 avx"
        ):
            a = compcache.compilation_cache_dir()
        with mock.patch.object(
            compcache, "_host_cpu_features", lambda: "flags: sse2 avx avx512f"
        ):
            b = compcache.compilation_cache_dir()
        assert a != b
        # Same jaxlib/python prefix, different feature hash suffix.
        assert a.rsplit("_", 1)[0] == b.rsplit("_", 1)[0]

    def test_embeds_versions(self):
        import sys

        import jaxlib

        path = compcache.compilation_cache_dir()
        assert jaxlib.__version__ in path
        assert f"py{sys.version_info[0]}{sys.version_info[1]}" in path
