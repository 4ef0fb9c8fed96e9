"""The generated API reference stays in sync with the public surface.

Every module's ``__all__`` symbol must appear in its committed
``docs/api`` page (regenerate with ``python scripts/gen_api_docs.py``
after changing the public API), and the tutorials/index must exist.
"""

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
DOCS = ROOT / "docs"


def test_api_docs_cover_every_public_symbol():
    sys.path.insert(0, str(ROOT / "scripts"))
    from gen_api_docs import iter_public_modules

    missing = []
    for name, mod in iter_public_modules():
        public = list(getattr(mod, "__all__", ()) or ())
        if not public:
            continue
        page = DOCS / "api" / (name.replace(".", "_") + ".md")
        if not page.exists():
            missing.append(f"{name}: page missing")
            continue
        text = page.read_text()
        for sym in public:
            if f"`{sym}" not in text:
                missing.append(f"{name}.{sym}")
    assert not missing, (
        "API docs out of sync (run scripts/gen_api_docs.py): "
        + ", ".join(missing[:20])
    )


def test_docs_landing_pages_exist():
    assert (DOCS / "api" / "index.md").exists()
    assert (DOCS / "MIGRATION.md").exists()
    assert (DOCS / "tutorials" / "canonical_mc.md").exists()
    assert (DOCS / "tutorials" / "charge_neutral_sgc.md").exists()
    index = (DOCS / "api" / "index.md").read_text()
    assert "MIGRATION.md" in index and "canonical_mc.md" in index
