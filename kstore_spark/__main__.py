from kstore_spark.cli import main

raise SystemExit(main())
