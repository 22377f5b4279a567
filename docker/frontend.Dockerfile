# Streamlit frontend (reference docker/frontend.Dockerfile:1-15)
FROM python:3.12-slim

WORKDIR /app
COPY deadtrees_tpu/serve/ui.py ./ui.py

RUN pip install --no-cache-dir streamlit requests pillow

EXPOSE 8501
CMD ["streamlit", "run", "ui.py", "--server.port=8501", "--server.address=0.0.0.0"]
