from distributed_computing_projects_spark.cli import main

raise SystemExit(main())
