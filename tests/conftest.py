import importlib.util
import sys

import pytest


def load_reference_module(name: str, path: str):
    """Import a reference module directly from its file, bypassing the
    package __init__ (which pulls heavy ML deps). Used ONLY as a test
    oracle — never at engine runtime."""
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def ref_result():
    return load_reference_module(
        "ref_result", "/root/reference/docstrange/result.py"
    )


@pytest.fixture(scope="session")
def spark():
    from docstrange_spark.session import get_spark

    s = get_spark(app_name="docstrange_spark_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
