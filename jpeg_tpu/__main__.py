import sys

from jpeg_tpu.cli import main

sys.exit(main())
