from visual_sgraphs_tpu.cli import main

raise SystemExit(main())
