"""Run the ACTUAL reference library (read-only at /root/reference) against
this engine — the direct evidence for the north rule's "F1 >= 0.99 vs
reference labels" and "byte-identical scrubbed text per url".

The reference's heavy wheels (fsspec, huggingface_hub, loguru, nltk, ...)
are not installed in this environment, so:

- every unavailable *infrastructure* package is auto-stubbed via a
  sys.meta_path finder (the filter/formatter decision logic under test is
  pure Python and never touches them at run time);
- ``nltk`` word/sentence tokenization — which needs the punkt pickle that
  cannot be downloaded offline — is provided by THIS ENGINE's portable
  tokenizers (config.py TOKENIZER NOTE). The comparison therefore measures
  decision-RULE parity with the tokenizer held fixed on both sides, which
  is the strongest parity statement the sandbox can support (and exactly
  the deviation SURVEY.md §7.3.1 documents).

Usage (see tests/test_reference_f1.py):
    from datatrove_spark.reference_impl import harness
    harness.install()                      # idempotent
    labels = harness.reference_battery_labels(texts)
"""

from __future__ import annotations

import importlib.abc
import importlib.machinery
import os
import sys
import types

REFERENCE_SRC = "/root/reference/src"

STUB_ROOTS = (
    "fsspec",
    "loguru",
    "tqdm",
    "humanize",
    "rich",
    "multiprocess",
    "dill",
    "xxhash",
    "huggingface_hub",
    "tokenizers",
)


class _Stub:
    def __init__(self, name: str = "stub"):
        self._name = name

    def __call__(self, *a, **k):
        return _Stub(self._name)

    def __getattr__(self, item):
        return _Stub(f"{self._name}.{item}")

    def __getitem__(self, item):
        return _Stub(f"{self._name}[{item!r}]")

    def __repr__(self):
        return f"<stub {self._name}>"


class _StubMeta(type):
    def __getattr__(cls, item):
        if item.startswith("__"):
            raise AttributeError(item)
        return _Stub(f"{cls.__name__}.{item}")


def _stub_class(name: str):
    return _StubMeta(
        name,
        (),
        {
            "__init__": lambda self, *a, **k: None,
            "__getattr__": lambda self, i: _Stub(i),
            "__getitem__": lambda self, i: _Stub(f"[{i!r}]"),
        },
    )


class _StubModule(types.ModuleType):
    __path__: list = []

    def __getattr__(self, item):
        if item.startswith("__"):
            raise AttributeError(item)
        return _stub_class(item)


class _StubFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    def find_spec(self, name, path=None, target=None):
        if name.split(".")[0] in STUB_ROOTS:
            return importlib.machinery.ModuleSpec(name, self, is_package=True)
        return None

    def create_module(self, spec):
        return _StubModule(spec.name)

    def exec_module(self, module):
        pass


_installed: list[_StubFinder] = []


def available() -> bool:
    return os.path.isdir(REFERENCE_SRC)


def install() -> None:
    """Idempotent: stub finder + engine-backed fake nltk + reference path."""
    if _installed:
        return
    finder = _StubFinder()
    sys.meta_path.insert(0, finder)
    _installed.append(finder)

    from datatrove_spark.reference_impl.filters import sentences, words

    nltk = types.ModuleType("nltk")
    nltk.__path__ = []
    nltk.__spec__ = importlib.machinery.ModuleSpec("nltk", None, is_package=True)
    nltk.load = lambda *a, **k: (_ for _ in ()).throw(LookupError("punkt unavailable offline"))
    tok = types.ModuleType("nltk.tokenize")
    tok.__spec__ = importlib.machinery.ModuleSpec("nltk.tokenize", None)
    tok.word_tokenize = lambda text, language="english": words(text)
    tok.sent_tokenize = lambda text, language="english": sentences(text)
    nltk.tokenize = tok
    sys.modules["nltk"] = nltk
    sys.modules["nltk.tokenize"] = tok

    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)


def reference_battery():
    """The reference's own filter objects in FineWeb order (the same order
    as registry.quality_pipeline)."""
    install()
    from datatrove.pipeline.filters.c4_filters import C4QualityFilter
    from datatrove.pipeline.filters.fineweb_quality_filter import FineWebQualityFilter
    from datatrove.pipeline.filters.gopher_quality_filter import GopherQualityFilter
    from datatrove.pipeline.filters.gopher_repetition_filter import GopherRepetitionFilter

    return [
        GopherRepetitionFilter(),
        GopherQualityFilter(),
        C4QualityFilter(),
        FineWebQualityFilter(),
    ]


def reference_battery_labels(texts) -> list[tuple[bool, str | None, str]]:
    """(keep, drop_reason, final_text) per doc from the reference's code.
    Docs on which the reference itself raises (e.g. ZeroDivisionError on
    empty text — this engine's NULL-safe ratios keep them) yield
    (True, "__reference_error__", text)."""
    install()
    from datatrove.data import Document

    filters = reference_battery()
    out = []
    for t in texts:
        doc = Document(text=t, id="x")
        verdict: tuple[bool, str | None] = (True, None)
        try:
            for f in filters:
                r = f.filter(doc)
                ok = r if isinstance(r, bool) else (r[0] if isinstance(r, tuple) else bool(r))
                if not ok:
                    verdict = (False, r[1] if isinstance(r, tuple) else "dropped")
                    break
        except Exception:
            verdict = (True, "__reference_error__")
        out.append((verdict[0], verdict[1], doc.text))
    return out


def reference_c4_badwords(badwords: dict[str, tuple[str, ...]], **kwargs):
    """The reference's C4BadWordsFilter with OUR word lists injected in place
    of the network download (cached_asset_path_or_download is patched to
    materialize the given lists as the one-word-per-line files the reference
    expects, c4_filters.py:245-253). Also widens the module's language
    registry so injected languages are accepted. Returns the filter object."""
    install()
    import tempfile

    from datatrove.pipeline.filters import c4_filters

    tmpdir = tempfile.mkdtemp(prefix="badwords_")

    def fake_download(url, namespace=None, subfolder=None, **_kw):
        lang = url.rsplit("/", 1)[-1]
        if lang not in badwords and url == c4_filters._EN_BADWORDS_URL:
            lang = "en"
        path = os.path.join(tmpdir, lang)
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n".join(badwords[lang]))
        return path

    c4_filters.cached_asset_path_or_download = fake_download
    missing = [lg for lg in badwords if lg not in c4_filters._BADWORDS_LANGS]
    c4_filters._BADWORDS_LANGS.extend(missing)
    return c4_filters.C4BadWordsFilter(**kwargs)


def reference_pii():
    """Reference PIIFormatter with a per-document counter reset helper —
    the engine's documented deterministic contract (SURVEY §7.3.2)."""
    install()
    from datatrove.pipeline.formatters.pii import PIIFormatter

    pii = PIIFormatter()

    def scrub_one(text: str) -> str:
        pii.emails_replacer._replace_i = 0
        pii.ip_replacer._replace_i = 0
        return pii.format(text)

    return scrub_one
