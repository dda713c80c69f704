import sys

from scrappie_tpu.cli.main import main

sys.exit(main())
