"""The reference's three pandas ETL tasks (``etl.py --task
revenue|rps|adjust``) re-expressed as pure-DataFrame transforms over the
:class:`~taipei_bi_etl_spark.tasks.base.EtlTask` lifecycle."""

from taipei_bi_etl_spark.tasks.base import EtlTask  # noqa: F401
