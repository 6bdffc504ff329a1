"""Public-surface parity guard against the reference package.

Parses the reference's ``__init__`` export list and asserts every name
is importable from ours (``modular_audio_pipeline_tpu`` re-exports the
same surface plus TPU extras — reference ``__init__.py:90-158``). Runs
only where the reference checkout is present.
"""

import ast
import re
from pathlib import Path

import pytest

_REF = Path("/root/reference/audio_pipeline/__init__.py")

pytestmark = pytest.mark.skipif(
    not _REF.exists(), reason="reference checkout not available"
)


def _reference_exports():
    tree = ast.parse(_REF.read_text())
    names = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    for elt in node.value.elts:
                        names.add(ast.literal_eval(elt))
    if not names:  # no __all__: collect import-from aliases
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom):
                for alias in node.names:
                    names.add(alias.asname or alias.name)
    # drop module-internal names that are not API
    return {n for n in names if not n.startswith("_")}


def test_every_reference_export_exists_here():
    import modular_audio_pipeline_tpu as ours

    ref = _reference_exports()
    assert ref, "failed to parse reference exports"
    # names with no meaning off-CUDA are intentionally dropped (none today)
    missing = sorted(n for n in ref if not hasattr(ours, n))
    assert not missing, f"reference exports missing from our package: {missing}"


def test_config_fields_superset():
    """Every reference nested-config field exists on our config classes
    (we add TPU knobs, never drop reference ones)."""
    ref_cfg = Path("/root/reference/audio_pipeline/config.py").read_text()
    import modular_audio_pipeline_tpu.config as ours

    for cls_match in re.finditer(
        r"class (\w+Config)\b.*?(?=\nclass |\Z)", ref_cfg, re.S
    ):
        cls_name = cls_match.group(1)
        if not hasattr(ours, cls_name):
            continue  # checked by the export test
        our_cls = getattr(ours, cls_name)
        body = cls_match.group(0)
        ref_fields = set(
            re.findall(r"^    (\w+)\s*:", body, re.M)
        )
        our_fields = set(getattr(our_cls, "__dataclass_fields__", {}))
        missing = sorted(ref_fields - our_fields)
        assert not missing, f"{cls_name} missing reference fields: {missing}"
