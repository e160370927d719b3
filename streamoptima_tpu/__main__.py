from streamoptima_tpu.main import main

raise SystemExit(main())
