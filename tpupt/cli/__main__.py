from tpupt.cli.main import main

raise SystemExit(main())
