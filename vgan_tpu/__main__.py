from vgan_tpu.cli import main

raise SystemExit(main())
