"""Single-triangle t-conorm sweep (reference: animations/triangles_tcn.py).

Thin wrapper over panda_tcn.py --triangle.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if __name__ == '__main__':
    sys.argv = [sys.argv[0], '--triangle'] + sys.argv[1:]
    import runpy
    runpy.run_path(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                'panda_tcn.py'), run_name='__main__')
