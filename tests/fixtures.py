"""Re-export the package micro-graph fixture for tests."""

from binaryx_graph_spark.fixtures.micro_graph import *  # noqa: F401,F403
from binaryx_graph_spark.fixtures.micro_graph import (  # noqa: F401
    DOC_A,
    DOC_B,
    HASH_A,
    HASH_B,
    UID_CREATEFILE,
    UID_EXPORTED_A,
    UID_HELPER_A,
    UID_MAIN_A,
    UID_MAIN_B,
    UID_WORKER_A,
    write_fixture,
)
