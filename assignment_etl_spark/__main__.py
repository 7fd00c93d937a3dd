"""`python -m assignment_etl_spark` — see cli.py."""

from assignment_etl_spark.cli import main

raise SystemExit(main())
