"""Generate the grafx-tpu API reference (markdown + HTML).

A self-contained autodoc tool (sphinx is not available in this
environment): walks the public package surface, extracts signatures and
docstrings via ``inspect``, instantiates processors with default
arguments to print their live ``parameter_size()``, and renders
everything to ``docs/api/*.md`` plus a browsable HTML site under
``docs/html/`` using the stdlib-adjacent ``markdown`` package.

Coverage model mirrors the reference's sphinx site
(reference: sphinx-doc/source/index.rst, processor_api/, graph_api/):
one API page per module, plus the long-form guides in ``docs/*.md``.

Run:  python docs/gen_api.py
"""

import html
import importlib
import inspect
import os
import pkgutil
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import grafx_tpu  # noqa: E402

DOCS_DIR = os.path.dirname(os.path.abspath(__file__))
API_DIR = os.path.join(DOCS_DIR, "api")
HTML_DIR = os.path.join(DOCS_DIR, "html")

MODULES = [
    "grafx_tpu.data.graph",
    "grafx_tpu.data.configs",
    "grafx_tpu.data.tensor",
    "grafx_tpu.data.conversion",
    "grafx_tpu.data.batch",
    "grafx_tpu.render.order.graph",
    "grafx_tpu.render.order.tensor",
    "grafx_tpu.render.prepare",
    "grafx_tpu.render.graph",
    "grafx_tpu.render.core",
    "grafx_tpu.render.streaming",
    "grafx_tpu.render.fuse",
    "grafx_tpu.processors.eq",
    "grafx_tpu.processors.filter",
    "grafx_tpu.processors.dynamics",
    "grafx_tpu.processors.reverb",
    "grafx_tpu.processors.delay",
    "grafx_tpu.processors.nonlinear",
    "grafx_tpu.processors.stereo",
    "grafx_tpu.processors.container",
    "grafx_tpu.processors.core.convolution",
    "grafx_tpu.processors.core.iir",
    "grafx_tpu.processors.core.envelope",
    "grafx_tpu.processors.core.delay",
    "grafx_tpu.processors.core.fir",
    "grafx_tpu.processors.core.fft_filterbank",
    "grafx_tpu.processors.core.geq",
    "grafx_tpu.processors.core.scale",
    "grafx_tpu.processors.core.noise",
    "grafx_tpu.processors.core.midside",
    "grafx_tpu.processors.core.utils",
    "grafx_tpu.ops.iir",
    "grafx_tpu.ops.fftconv",
    "grafx_tpu.ops.stft",
    "grafx_tpu.ops.ballistics",
    "grafx_tpu.ops.ballistics_tpu",
    "grafx_tpu.ops.losses",
    "grafx_tpu.draw.graph",
    "grafx_tpu.draw.position",
    "grafx_tpu.draw.node",
    "grafx_tpu.draw.edge",
    "grafx_tpu.draw.style",
    "grafx_tpu.parallel",
    "grafx_tpu.checkpoint",
    "grafx_tpu.serving",
    "grafx_tpu.profiling",
    "grafx_tpu.models.console",
    "grafx_tpu.models.optimize",
    "grafx_tpu.models.predictor",
    "grafx_tpu.utils",
]

CSS = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
       max-width: 56rem; margin: 2rem auto; padding: 0 1rem;
       color: #1a202c; line-height: 1.55; }
code, pre { font-family: ui-monospace, 'SF Mono', Menlo, monospace;
            background: #f6f8fa; border-radius: 4px; }
code { padding: 0.1em 0.3em; font-size: 0.92em; }
pre { padding: 0.8rem 1rem; overflow-x: auto; }
pre code { background: none; padding: 0; }
h1, h2, h3 { line-height: 1.25; }
h2 { border-bottom: 1px solid #e2e8f0; padding-bottom: 0.2rem;
     margin-top: 2.2rem; }
h3 { margin-top: 1.8rem; }
a { color: #2563eb; text-decoration: none; }
a:hover { text-decoration: underline; }
table { border-collapse: collapse; }
td, th { border: 1px solid #e2e8f0; padding: 0.3rem 0.6rem; }
.sig { background: #eef2ff; padding: 0.5rem 0.8rem; border-radius: 6px;
       display: block; margin: 0.4rem 0; }
nav { font-size: 0.9rem; margin-bottom: 1.5rem; color: #64748b; }
"""


def _signature(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj):
    d = inspect.getdoc(obj)
    return d if d else ""


def _live_parameter_size(cls):
    """Instantiate with defaults and report parameter_size(); processors
    whose constructor needs arguments report per-argument shapes from the
    docstring instead."""
    try:
        inst = cls()
        size = inst.parameter_size()
        return repr(size)
    except Exception:
        return None


def render_module(modname):
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", ""]
    moddoc = _doc(mod)
    if moddoc:
        lines += [moddoc, ""]

    members = []
    for name, obj in vars(mod).items():
        if name.startswith("_"):
            continue
        if inspect.isclass(obj) or inspect.isfunction(obj):
            if getattr(obj, "__module__", None) != modname:
                continue  # re-exports documented at their home module
            members.append((name, obj))

    for name, obj in members:
        if inspect.isclass(obj):
            lines += [f"## class `{name}`", ""]
            lines += [f'<code class="sig">{name}{_signature(obj)}</code>', ""]
            d = _doc(obj)
            if d:
                lines += [d, ""]
            if hasattr(obj, "parameter_size"):
                ps = _live_parameter_size(obj)
                if ps is not None:
                    lines += [
                        "**`parameter_size()` (default construction):**",
                        "",
                        "```python",
                        ps,
                        "```",
                        "",
                    ]
            for mname, meth in sorted(vars(obj).items()):
                if mname.startswith("_") and mname != "__call__":
                    continue
                if not (inspect.isfunction(meth) or isinstance(meth, staticmethod)):
                    continue
                fn = meth.__func__ if isinstance(meth, staticmethod) else meth
                lines += [f"### `{name}.{mname}`", ""]
                lines += [
                    f'<code class="sig">{mname}{_signature(fn)}</code>',
                    "",
                ]
                md = _doc(fn)
                if md:
                    lines += [md, ""]
        else:
            lines += [f"## `{name}`", ""]
            lines += [f'<code class="sig">{name}{_signature(obj)}</code>', ""]
            d = _doc(obj)
            if d:
                lines += [d, ""]
    return "\n".join(lines)


def main():
    os.makedirs(API_DIR, exist_ok=True)
    os.makedirs(HTML_DIR, exist_ok=True)

    index_lines = [
        "# grafx-tpu API reference",
        "",
        "Generated by `docs/gen_api.py` (run it after changing public"
        " docstrings).  Guides: [index](../index.md),"
        " [render engine](../render.md), [processors](../processors.md),"
        " [graph data](../data.md).",
        "",
    ]
    pages = {}
    section = None
    for modname in MODULES:
        top = modname.split(".")[1]
        if top != section:
            section = top
            index_lines += [f"## `grafx_tpu.{section}`", ""]
        fname = modname.replace(".", "_") + ".md"
        md = render_module(modname)
        pages[fname] = md
        with open(os.path.join(API_DIR, fname), "w") as f:
            f.write(md)
        first = ""
        moddoc = _doc(importlib.import_module(modname))
        if moddoc:
            first = " — " + moddoc.strip().splitlines()[0].rstrip(".")
        index_lines += [f"- [`{modname}`]({fname}){first}", ""]
    index_md = "\n".join(index_lines)
    pages["index.md"] = index_md
    with open(os.path.join(API_DIR, "index.md"), "w") as f:
        f.write(index_md)

    # HTML build (guides + API)
    import markdown as md_lib

    def to_html(md_text, title, depth_prefix=""):
        body = md_lib.markdown(
            md_text, extensions=["fenced_code", "tables"]
        )
        nav = (
            f'<nav><a href="{depth_prefix}index.html">guides</a> · '
            f'<a href="{depth_prefix}api_index.html">API reference</a></nav>'
        )
        return (
            f"<!doctype html><html><head><meta charset='utf-8'>"
            f"<title>{html.escape(title)}</title><style>{CSS}</style></head>"
            f"<body>{nav}{body}</body></html>"
        )

    for fname, md_text in pages.items():
        out = "api_" + fname.replace(".md", ".html")
        if fname == "index.md":
            out = "api_index.html"
        text = md_text.replace(".md)", ".html)").replace(
            "(../index.html)", "(index.html)"
        )
        # fix api-internal links to the api_ prefix
        for other in pages:
            text = text.replace(f"({other.replace('.md', '.html')})",
                                f"(api_{other.replace('.md', '.html')})")
        text = text.replace("(../index.html)", "(index.html)").replace(
            "(../render.html)", "(render.html)"
        ).replace("(../processors.html)", "(processors.html)").replace(
            "(../data.html)", "(data.html)"
        )
        with open(os.path.join(HTML_DIR, out), "w") as f:
            f.write(to_html(text, fname.replace(".md", "")))

    for guide in ["index.md", "render.md", "processors.md", "data.md"]:
        path = os.path.join(DOCS_DIR, guide)
        if not os.path.exists(path):
            continue
        text = open(path).read().replace(".md)", ".html)")
        with open(
            os.path.join(HTML_DIR, guide.replace(".md", ".html")), "w"
        ) as f:
            f.write(to_html(text, guide.replace(".md", "")))

    n_classes = sum(p.count("\n## class ") for p in pages.values())
    n_fns = sum(p.count("\n## `") for p in pages.values())
    print(
        f"wrote {len(pages)} API pages ({n_classes} classes, {n_fns} functions)"
        f" to {API_DIR} and HTML to {HTML_DIR}"
    )


if __name__ == "__main__":
    main()
