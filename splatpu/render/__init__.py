from splatpu.render.types import RenderOutput
from splatpu.render.oracle import render_oracle
from splatpu.render.api import render
