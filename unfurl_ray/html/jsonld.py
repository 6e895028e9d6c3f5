"""JSON-LD expansion (practical subset) + graph normalization.

Reimplements the observable behavior of ``jsonld.expand({base,
documentLoader})`` + ``normalizeJsonLd`` in the reference
(unfurl-html/src/index.ts:177-207), scoped to the constructs the
conformance corpus exercises: string/dict/array ``@context`` (including
remote contexts resolved through an offline cache), term definitions
with ``@id``/``@type``/``@container``, ``@vocab``, prefixes, keyword
aliases, ``@graph`` flattening, and the same-document ``@id`` filter.

The remote-context loader is a plain dict cache (url -> parsed context
document), mirroring the memoized loader (unfurl-html/src/index.ts:
146-172).  In the Ray pipeline the cache is built once from a side
table and broadcast via ``ray.put`` / actor ``__init__`` (SURVEY.md
§2.4 T1) — never fetched per batch.
"""

from __future__ import annotations

from typing import Any

KEYWORDS = frozenset(
    ["@context", "@id", "@type", "@value", "@language", "@graph", "@list",
     "@set", "@reverse", "@index", "@base", "@vocab", "@container",
     "@nest", "@none", "@direction", "@version", "@protected"]
)


class ActiveContext:
    __slots__ = ("terms", "vocab", "base", "language")

    def __init__(self, base: str | None = None):
        # term -> {"id": iri, "type": str|None, "container": str|None}
        self.terms: dict[str, dict] = {}
        self.vocab: str | None = None
        self.base = base
        self.language: str | None = None

    def clone(self) -> "ActiveContext":
        ctx = ActiveContext(self.base)
        ctx.terms = dict(self.terms)
        ctx.vocab = self.vocab
        ctx.language = self.language
        return ctx


class ExpandError(ValueError):
    pass


def _resolve_iri(ref: str, base: str | None) -> str:
    if ref.startswith(("http://", "https://")) or base is None:
        return ref
    from unfurl_ray.core.url import resolve_url, UrlError
    try:
        return resolve_url(ref, base)
    except (UrlError, ValueError):
        return ref


def process_context(
    local: Any,
    active: ActiveContext,
    loader: dict[str, Any] | None,
    depth: int = 0,
) -> ActiveContext:
    """Merge a local @context into a copy of the active context."""
    if depth > 8:
        raise ExpandError("context recursion too deep")
    ctx = active.clone()
    for entry in local if isinstance(local, list) else [local]:
        if entry is None:
            ctx = ActiveContext(active.base)
            continue
        if isinstance(entry, str):
            url = _resolve_iri(entry, ctx.base)
            doc = _load_context(url, loader)
            if doc is None:
                raise ExpandError(f"cannot load remote context {url!r}")
            ctx = process_context(doc, ctx, loader, depth + 1)
            continue
        if not isinstance(entry, dict):
            raise ExpandError(f"invalid @context entry {type(entry)!r}")
        if "@vocab" in entry:
            v = entry["@vocab"]
            ctx.vocab = v if isinstance(v, str) and v else None
        if "@base" in entry:
            b = entry["@base"]
            ctx.base = b if isinstance(b, str) and b else None
        if "@language" in entry:
            lang = entry["@language"]
            ctx.language = lang if isinstance(lang, str) else None
        for term, defn in entry.items():
            if term.startswith("@"):
                continue
            if defn is None:
                ctx.terms.pop(term, None)
            elif isinstance(defn, str):
                ctx.terms[term] = {"id": defn, "type": None, "container": None}
            elif isinstance(defn, dict):
                ctx.terms[term] = {
                    "id": defn.get("@id", term if ctx.vocab else None),
                    "type": defn.get("@type"),
                    "container": _container_of(defn.get("@container")),
                }
    # Second pass: resolve term ids that are themselves CURIEs/terms.
    for term, info in ctx.terms.items():
        tid = info["id"]
        if isinstance(tid, str) and not tid.startswith("@"):
            info["id"] = _expand_iri(tid, ctx, vocab=True, _term=term)
    return ctx


def _container_of(value: Any) -> str | None:
    if isinstance(value, list):
        return value[0] if value else None
    return value


def _load_context(url: str, loader: dict[str, Any] | None) -> Any:
    if not loader:
        return None
    doc = loader.get(url)
    if doc is None and url.startswith("https://"):
        doc = loader.get("http://" + url[8:])
    if doc is None and url.startswith("http://"):
        doc = loader.get("https://" + url[7:])
    if doc is None:
        # Trailing-slash variants (http://schema.org vs http://schema.org/).
        alt = url.rstrip("/") if url.endswith("/") else url + "/"
        doc = loader.get(alt)
        if doc is None and alt.startswith("http://"):
            doc = loader.get("https://" + alt[7:])
        if doc is None and alt.startswith("https://"):
            doc = loader.get("http://" + alt[8:])
    if isinstance(doc, dict) and "@context" in doc:
        return doc["@context"]
    return doc


def _expand_iri(
    value: str,
    ctx: ActiveContext,
    vocab: bool = False,
    document_relative: bool = False,
    _term: str | None = None,
) -> str | None:
    """Expand a term/CURIE/IRI to an absolute IRI (or keyword)."""
    if value.startswith("@") and value[1:].isalpha():
        return value if value in KEYWORDS else None
    if vocab and value in ctx.terms and value != _term:
        tid = ctx.terms[value]["id"]
        if tid is None:
            return None
        if isinstance(tid, str) and tid.startswith("@"):
            return tid
        return tid
    if ":" in value:
        prefix, suffix = value.split(":", 1)
        if suffix.startswith("//") or prefix in ("_",):
            return value
        if prefix in ctx.terms and prefix != _term:
            base = ctx.terms[prefix]["id"]
            if isinstance(base, str) and not base.startswith("@"):
                return base + suffix
        return value
    if vocab and ctx.vocab:
        return ctx.vocab + value
    if document_relative and ctx.base:
        return _resolve_iri(value, ctx.base)
    return None


def _alias_targets(ctx: ActiveContext) -> dict[str, str]:
    aliases = {}
    for term, info in ctx.terms.items():
        tid = info.get("id")
        if isinstance(tid, str) and tid.startswith("@"):
            aliases[term] = tid
    return aliases


def _expand_value(value: Any, type_mapping: str | None, ctx: ActiveContext) -> Any:
    if type_mapping == "@id" or type_mapping == "@vocab":
        if isinstance(value, str):
            iri = _expand_iri(
                value, ctx, vocab=(type_mapping == "@vocab"),
                document_relative=True,
            )
            return {"@id": iri if iri is not None else value}
    result: dict = {"@value": value}
    if type_mapping and not type_mapping.startswith("@"):
        expanded_type = _expand_iri(type_mapping, ctx, vocab=True)
        if expanded_type:
            result["@type"] = expanded_type
    elif isinstance(value, str) and ctx.language:
        result["@language"] = ctx.language
    return result


def _expand_node(
    node: dict,
    ctx: ActiveContext,
    loader: dict[str, Any] | None,
    depth: int = 0,
) -> Any:
    if depth > 32:
        raise ExpandError("node recursion too deep")
    if "@context" in node:
        ctx = process_context(node["@context"], ctx, loader)
    aliases = _alias_targets(ctx)
    out: dict = {}
    for raw_key, raw_val in node.items():
        if raw_key == "@context":
            continue
        key = aliases.get(raw_key, raw_key)
        if key == "@id":
            if isinstance(raw_val, str):
                iri = _expand_iri(raw_val, ctx, document_relative=True)
                out["@id"] = iri if iri is not None else raw_val
            continue
        if key == "@type":
            vals = raw_val if isinstance(raw_val, list) else [raw_val]
            types = []
            for t in vals:
                if isinstance(t, str):
                    expanded = _expand_iri(t, ctx, vocab=True,
                                           document_relative=True)
                    types.append(expanded if expanded is not None else t)
            out["@type"] = types
            continue
        if key == "@graph":
            vals = raw_val if isinstance(raw_val, list) else [raw_val]
            out["@graph"] = [
                _expand_node(v, ctx, loader, depth + 1)
                for v in vals
                if isinstance(v, dict)
            ]
            continue
        if key == "@value":
            out["@value"] = raw_val
            continue
        if key in ("@language", "@index", "@direction"):
            out[key] = raw_val
            continue
        if key == "@reverse" or key == "@nest":
            continue  # out of subset scope
        if key.startswith("@") and key in KEYWORDS:
            continue
        # Ordinary property.
        term_info = ctx.terms.get(raw_key)
        iri = _expand_iri(raw_key, ctx, vocab=True)
        if iri is None or (iri not in KEYWORDS and ":" not in iri):
            continue
        type_mapping = term_info["type"] if term_info else None
        expanded_vals = _expand_values(raw_val, type_mapping, ctx, loader, depth)
        if expanded_vals:
            out.setdefault(iri, []).extend(expanded_vals)
    return out


def _expand_values(
    raw_val: Any,
    type_mapping: str | None,
    ctx: ActiveContext,
    loader: dict[str, Any] | None,
    depth: int,
) -> list:
    vals = raw_val if isinstance(raw_val, list) else [raw_val]
    out = []
    for v in vals:
        if v is None:
            continue
        if isinstance(v, dict):
            if "@list" in v or "@set" in v:
                inner = v.get("@list", v.get("@set"))
                items = _expand_values(inner, type_mapping, ctx, loader, depth)
                if "@list" in v:
                    out.append({"@list": items})
                else:
                    out.extend(items)
            elif "@value" in v:
                ev: dict = {"@value": v["@value"]}
                if "@type" in v and isinstance(v["@type"], str):
                    et = _expand_iri(v["@type"], ctx, vocab=True)
                    if et:
                        ev["@type"] = et
                if "@language" in v:
                    ev["@language"] = v["@language"]
                out.append(ev)
            else:
                out.append(_expand_node(v, ctx, loader, depth + 1))
        elif isinstance(v, list):
            out.extend(_expand_values(v, type_mapping, ctx, loader, depth))
        else:
            out.append(_expand_value(v, type_mapping, ctx))
    return out


def expand(
    docs: list[dict],
    base: str,
    loader: dict[str, Any] | None = None,
) -> list[dict] | None:
    """Expand a list of JSON-LD documents; any error -> None.

    Mirrors ``expand(...).catch(() => undefined)`` at
    unfurl-html/src/index.ts:185-188.
    """
    try:
        result = []
        for doc in docs:
            if not isinstance(doc, dict):
                continue
            ctx = ActiveContext(base)
            expanded = _expand_node(doc, ctx, loader)
            if expanded:
                # Top-level @graph-only wrappers expand to graph arrays.
                result.append(expanded)
        return result
    except Exception:
        return None


def normalize_jsonld(
    data: list[dict],
    url: str,
    loader: dict[str, Any] | None = None,
) -> list[dict] | None:
    """Expand + flatten ``@graph`` + keep same-document nodes.

    Mirrors ``normalizeJsonLd`` (unfurl-html/src/index.ts:177-207): a
    node is kept when its ``@id`` is absent, equals the page URL up to
    ``#``, or is a fragment of it.
    """
    if not data:
        return None
    result = expand(data, url, loader)
    if result is None:
        return None
    id_prefix = url.split("#", 1)[0]
    flattened: list[dict] = []
    for node in result:
        graph = node.get("@graph")
        if isinstance(graph, list):
            rest = {k: v for k, v in node.items() if k != "@graph"}
            flattened.extend(graph)
            if any(not k.startswith("@") for k in rest):
                flattened.append(rest)
        elif node:
            flattened.append(node)
    out = []
    for node in flattened:
        nid = node.get("@id")
        if not isinstance(nid, str) or not nid or nid == id_prefix or \
                nid.startswith(id_prefix + "#"):
            out.append(node)
    return out
